"""Corpus-ingestion queries: WARC extraction, ZIP, PDF and Avro document
extraction, HTML boilerplate strip, WebDataset shard round-trip.

These are the query-layer wrappers over the round-10 library additions
(``sources/{warc,webdataset,zipshard,pdfdoc,avro_io}.py``,
``operators/{html,flac}.py``, the mm26–mm29 probes in
``operators/multimodal.py``). All were written — and oracle-verified
with the driver's exact canonical compare in tests/test_corpus_ingest.py
— in round 10, and REGISTERED in the round-11 window (the r10 window
was exactly full with the r9-verdict rotation). The codec-side five
(mm25–mm29) register in queries/multimodal.py; the container/text
family (c1–c4, t15, wd1, plus the round-11-built c5 LZ4 and c6 Snappy
legs) registers here.

Plan shapes (asserted in tests):
- c1: synthesis + gzip/WARC/HTTP/HTML extraction in ONE Arrow map pass —
  no data-dependent shuffle, only the small-input fan-out (a no-op at
  production split counts; see readers.fan_out).
- t15: pure JVM column algebra (concat + regexp chain) — zero Python;
  staged selects keep each regex chain evaluated once.
- wd1: exactly TWO hash exchanges (the shard groupBy build + the stats
  groupBy), explode side map-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.html import (
    html_link_count_column,
    html_link_count_sql,
    html_title_column,
    html_title_sql,
    html_to_text_column,
    html_to_text_sql,
)
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.sources.readers import fan_out, load_table
from pipeline_mf_etl_spark.sources.warc import (
    HTML_PAGE_TEMPLATE,
    extract_warc_documents,
    with_warc_payload,
)
from pipeline_mf_etl_spark.sources.webdataset import (
    build_webdataset_shards,
    explode_webdataset,
)

# ---------------------------------------------------------------------------
# The synthetic page as engine expressions — both assembled from
# sources/warc.HTML_PAGE_TEMPLATE (the single source synth_html_page
# uses), so the three consumers cannot drift.
# ---------------------------------------------------------------------------


def _escape_text_column(col: Column) -> Column:
    # mirror warc._escape_html_text: &, <, > in that order
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def html_page_column(doc_id: Column, text: Column) -> Column:
    """synth_html_page as a JVM concat expression."""
    subst = {
        "ID": doc_id.cast("string"),
        "ID1": (doc_id + 1).cast("string"),
        "TEXT": _escape_text_column(text),
    }
    return F.concat(
        *(subst[tok] if tok in subst else F.lit(tok) for tok in HTML_PAGE_TEMPLATE)
    )


def html_page_sql(doc_id: str, text: str) -> str:
    """synth_html_page as a DuckDB || expression."""
    esc = (
        f"replace(replace(replace({text}, '&', '&amp;'),"
        " '<', '&lt;'), '>', '&gt;')"
    )
    subst = {
        "ID": f"CAST({doc_id} AS VARCHAR)",
        "ID1": f"CAST({doc_id} + 1 AS VARCHAR)",
        "TEXT": esc,
    }
    parts = [
        subst.get(tok) or "'" + tok.replace("'", "''") + "'"
        for tok in HTML_PAGE_TEMPLATE
    ]
    return "(" + " || ".join(parts) + ")"


# ---------------------------------------------------------------------------
# c1 — WARC/Common-Crawl extraction end-to-end
# ---------------------------------------------------------------------------


def c1_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl ingestion end-to-end: synthesize one 3-record
    .warc.gz capture per document (warcinfo/request/response, HTTP
    framing variants cycled by doc_id), then run the real ingestion
    pass — gzip member split, ISO 28500 record walk, HTTP parse
    (de-chunk + inflate), HTML boilerplate strip — in ONE Arrow map
    pipeline. The oracle reconstructs every field from the characters
    (the synthesis is invertible), certifying all four layers at once."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ext = extract_warc_documents(with_warc_payload(docs))
    return ext.select(
        "doc_id",
        "url",
        "warc_date",
        "http_status",
        "content_type",
        "n_members",
        "n_records",
        "body_bytes",
        html_to_text_column(F.col("html")).alias("page_text"),
        html_title_column(F.col("html")).alias("page_title"),
        html_link_count_column(F.col("html")).cast("long").alias("n_links"),
    )


_PAGE = html_page_sql("doc_id", "text")

C1_ORACLE = f"""
    SELECT doc_id,
           'https://corpus.example/doc/' || doc_id AS url,
           printf('2026-01-%02dT00:00:00Z', (doc_id % 28) + 1) AS warc_date,
           200 AS http_status,
           'text/html; charset=utf-8' AS content_type,
           3 AS n_members,
           3 AS n_records,
           strlen({_PAGE}) AS body_bytes,
           {html_to_text_sql(_PAGE)} AS page_text,
           {html_title_sql(_PAGE)} AS page_title,
           {html_link_count_sql(_PAGE)} AS n_links
    FROM documents
"""


# ---------------------------------------------------------------------------
# t15 — HTML boilerplate strip (pure JVM column algebra)
# ---------------------------------------------------------------------------


def t15_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate-strip pass alone, Python-free: build the page
    with JVM concat, strip with the JVM regexp chain, emit the routing
    features curation filters on (title, link count, shrink ratio).
    Zero Python — the shape this runs at 100 TB.

    Staged selects on purpose: inlining ``page``/``stripped`` into
    every output column put 44 regexp_replace nodes in the plan (the
    12-regex chain duplicated per consumer — runtime subexpression
    elimination only partially collapses them; measured ~35% slower).
    The staged form keeps one evaluation of each (16 plan nodes)
    because CollapseProject refuses to inline non-cheap expressions
    referenced more than once."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id",
        "lang",
        html_page_column(F.col("doc_id"), F.col("text")).alias("page"),
    ).select(
        "doc_id", "lang", "page", html_to_text_column(F.col("page")).alias("stripped")
    )
    return staged.select(
        "doc_id",
        "lang",
        html_title_column(F.col("page")).alias("page_title"),
        html_link_count_column(F.col("page")).cast("long").alias("n_links"),
        F.length("page").cast("long").alias("page_chars"),
        F.length("stripped").cast("long").alias("text_chars"),
        F.round(F.length("stripped").cast("double") / F.length("page"), 6).alias(
            "shrink_ratio"
        ),
    )


T15_ORACLE = f"""
    WITH s AS (
        SELECT doc_id, lang,
               {_PAGE} AS page,
               {html_to_text_sql(_PAGE)} AS stripped
        FROM documents
    )
    SELECT doc_id, lang,
           {html_title_sql('page')} AS page_title,
           {html_link_count_sql('page')} AS n_links,
           length(page) AS page_chars,
           length(stripped) AS text_chars,
           round(length(stripped) * 1.0 / length(page), 6) AS shrink_ratio
    FROM s
"""


# ---------------------------------------------------------------------------
# wd1 — WebDataset shard round-trip accounting
# ---------------------------------------------------------------------------

_DOCS_PER_SHARD = 16


def wd1_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Package the corpus into WebDataset tar shards (16 docs/shard),
    explode them back through the loader path, and account per shard:
    sample count, distinct docs/langs, member-byte totals, id range.
    The hash match proves the tar bytes round-trip every document and
    the deterministic member sizes (txt + sorted-key json) agree."""
    docs = load_table(spark, sf_dir, "documents")
    shards = build_webdataset_shards(docs, _DOCS_PER_SHARD)
    samples = explode_webdataset(shards)
    # distinct counts via collect_set size, NOT countDistinct: two
    # countDistinct columns trigger the Expand rewrite (3 output rows
    # per sample + an extra full shuffle on the expanded grain); the
    # sets here are bounded by docs_per_shard, so a single-pass hash
    # agg with partial combine is strictly better at any scale
    return samples.groupBy("shard_id").agg(
        F.count("*").alias("n_samples"),
        F.size(F.collect_set("doc_id")).cast("long").alias("n_docs"),
        F.size(F.collect_set("lang")).cast("long").alias("n_langs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


#: json.dumps({...}, sort_keys=True) of the sample metadata — keys are
#: already alphabetical (doc_id, lang, source); default separators.
#: Byte semantics: DuckDB strlen() counts BYTES (length() counts
#: characters — tests/test_nonascii.py pins this), so total_bytes is
#: byte-exact on non-ASCII text too. The one remaining assumption is
#: ASCII lang/source values: json.dumps escapes non-ASCII there
#: (ensure_ascii) while the SQL concatenation would not.
_META_JSON = (
    "'{\"doc_id\": ' || doc_id || ', \"lang\": \"' || lang ||"
    " '\", \"source\": \"' || source || '\"}'"
)

WD1_ORACLE = f"""
    SELECT doc_id // {_DOCS_PER_SHARD} AS shard_id,
           count(*) AS n_samples,
           count(DISTINCT doc_id) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(strlen(text) + strlen({_META_JSON})) AS BIGINT)
               AS total_bytes,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# c2 — ZIP bundle extraction (the random-access container code corpora
# ship in; sources/zipshard.py walks EOCD/central-directory/local
# headers with CRC-32 verification)
# ---------------------------------------------------------------------------


def c2_zip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract one 3-member ZIP bundle per document (text DEFLATE, meta
    STORED, README alternating) through the full verified walk; emit
    member accounting + the recovered text. Map-only Arrow pass; the
    oracle recomputes everything from the characters (the synthesis is
    deterministic and the codec lossless)."""
    from pipeline_mf_etl_spark.sources.zipshard import (
        extract_zip_documents,
        with_zip_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_zip_documents(with_zip_payload(docs))


_C2_META = "'{\"doc_id\": ' || doc_id || ', \"n_chars\": ' || strlen(text) || '}'"

C2_ORACLE = f"""
    SELECT doc_id,
           3 AS n_members,
           1 + doc_id % 2 AS n_deflated,
           2 - doc_id % 2 AS n_stored,
           strlen(text) + strlen({_C2_META}) + 24 AS total_uncompressed,
           text AS text_out,
           strlen({_C2_META}) AS meta_len
    FROM documents
"""


# ---------------------------------------------------------------------------
# c3 — PDF structure walk + text extraction (sources/pdfdoc.py: xref
# table + trailer parse, object tokenizer, page-tree walk, FlateDecode
# content streams, Tj/TJ show-operator text)
# ---------------------------------------------------------------------------


def c3_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract one synthesized multi-page PDF per document through the
    full classic-form structure walk; emit page/object accounting and
    the recovered text. Map-only Arrow pass; the oracle recomputes
    everything from the characters (80 chars/page, fixed object
    layout, lossless text path)."""
    from pipeline_mf_etl_spark.sources.pdfdoc import (
        extract_pdf_documents,
        with_pdf_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_pdf_documents(with_pdf_payload(docs))


C3_ORACLE = """
    WITH geo AS (
        SELECT doc_id, text,
               CASE WHEN length(text) = 0 THEN 1
                    ELSE (length(text) + 79) // 80 END AS np
        FROM documents
    )
    SELECT doc_id,
           np AS n_pages,
           3 + 2 * np AS n_objects,
           '1.4' AS pdf_version,
           text AS text_out,
           LEAST(length(text), 80) AS first_page_chars
    FROM geo
"""


# ---------------------------------------------------------------------------
# c4 — Avro object-container extraction (sources/avro_io.py: the
# data-lake interchange format; metadata map, schema JSON, per-block
# sync verification, zigzag-varint record decode incl. union branches)
# ---------------------------------------------------------------------------


def c4_avro_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode one multi-record Avro container per document (25-char
    chunk records, 8/block, union-typed lang taking the null branch
    every third record, deflate for odd doc_ids) and reassemble the
    text in seq order. Map-only Arrow pass; the oracle replays the
    chunking/union arithmetic from the characters."""
    from pipeline_mf_etl_spark.sources.avro_io import (
        extract_avro_documents,
        with_avro_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_avro_documents(with_avro_payload(docs))


C4_ORACLE = """
    WITH geo AS (
        SELECT doc_id, text,
               CASE WHEN length(text) = 0 THEN 1
                    ELSE (length(text) + 24) // 25 END AS nr
        FROM documents
    ), nulls AS (
        SELECT g.doc_id,
               CAST(sum(CASE WHEN (g.doc_id + t.i) % 3 = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null
        FROM geo g, UNNEST(range(g.nr)) AS t(i)
        GROUP BY g.doc_id
    )
    SELECT g.doc_id,
           g.nr AS n_records,
           (g.nr + 7) // 8 AS n_blocks,
           CASE g.doc_id % 2 WHEN 0 THEN 'null' ELSE 'deflate' END AS codec,
           g.text AS text_out,
           n.n_null AS n_null_langs
    FROM geo g JOIN nulls n USING (doc_id)
"""


# ---------------------------------------------------------------------------
# c5 — LZ4-framed shard extraction (sources/lz4frame.py: the data-lake
# interchange compression; real greedy block compressor, frame walk
# with header/block/content xxh32 verification)
# ---------------------------------------------------------------------------


def c5_lz4_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode one LZ4 frame per document (content = ``text\\n`` x3 so
    the real compressor finds long in-block matches; block/content
    checksum flags cycle by doc_id) through the fully verified frame
    walk; emit block accounting + content integrity. Map-only Arrow
    pass; the oracle replays the frame arithmetic and the md5 from the
    characters. The n_compressed_blocks column stays OFF this query on
    purpose — compressibility is a compressor property SQL cannot
    replay (it is asserted in tests/test_lz4.py instead)."""
    from pipeline_mf_etl_spark.sources.lz4frame import (
        extract_lz4_documents,
        with_lz4_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ext = extract_lz4_documents(with_lz4_payload(docs))
    return ext.select(
        "doc_id",
        "n_blocks",
        "had_block_checksums",
        "had_content_checksum",
        "content_size",
        "content_md5",
        "text_out",
    )


C5_ORACLE = """
    SELECT doc_id,
           CAST((3 * (length(text) + 1) + 1023) // 1024 AS BIGINT) AS n_blocks,
           doc_id % 2 = 1 AS had_block_checksums,
           doc_id % 3 <> 0 AS had_content_checksum,
           CAST(3 * (length(text) + 1) AS BIGINT) AS content_size,
           md5(repeat(text || chr(10), 3)) AS content_md5,
           text AS text_out
    FROM documents
"""


# ---------------------------------------------------------------------------
# c7 — zstd frame extraction (sources/zstdframe.py: the codec the
# reference's parquet config ships — real FSE + Huffman decode with
# the full frame walk and XXH64 content checksums; registered r12,
# completing the data-lake compression trio with c5/c6)
# ---------------------------------------------------------------------------


def c7_zstd_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode one zstd frame per document (content = ``text\\n`` x3 so
    the LZ parser finds real matches; checksum and single-segment
    flags cycle by doc_id so both frame-header shapes carry hash
    signal) through the fully verified walk — FSE states, Huffman
    literals, sequence execution, XXH64 — and emit block accounting +
    content integrity. Map-only Arrow pass; the oracle replays the
    frame arithmetic and the md5 from the characters.
    n_compressed_blocks stays OFF this query — compressibility is a
    compressor property SQL cannot replay (tests/test_zstd.py asserts
    it instead)."""
    from pipeline_mf_etl_spark.sources.zstdframe import (
        extract_zstd_documents,
        with_zstd_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ext = extract_zstd_documents(with_zstd_payload(docs))
    return ext.select(
        "doc_id",
        "n_blocks",
        "single_segment",
        "had_checksum",
        "content_size",
        "content_md5",
        "text_out",
    )


C7_ORACLE = """
    SELECT doc_id,
           CAST((3 * (length(text) + 1) + 1023) // 1024 AS BIGINT) AS n_blocks,
           doc_id % 3 <> 0 AS single_segment,
           doc_id % 2 = 0 AS had_checksum,
           CAST(3 * (length(text) + 1) AS BIGINT) AS content_size,
           md5(repeat(text || chr(10), 3)) AS content_md5,
           text AS text_out
    FROM documents
"""


# ---------------------------------------------------------------------------
# c8 — seekable-zstd range reads (sources/zstdframe.py seekable layer:
# the public facebook/zstd seekable format; registered r12). The query
# certifies the RANGE-READ path: each doc becomes a multi-frame
# seekable archive, a deterministic interior slice is range-read
# (decoding ONLY its covering frames, per-frame checksums verified),
# and the oracle recomputes the slice and the touched-frame count from
# the characters. frames_touched < n_frames on every doc long enough
# to span frames — the partial-decode property itself carries hash
# signal.
# ---------------------------------------------------------------------------

_SEEK_FRAME = 512  # decompressed bytes per seekable frame
_SEEK_SLICE = 256  # range-read length cap


def c8_seekable_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-read accounting per document over a seekable-zstd archive
    (content = ``text\\n`` x3, 512-byte frames): seek-table geometry,
    the md5 + text of the slice read from offset len(text)+1, and the
    number of frames the read actually decoded. Map-only Arrow pass."""
    import hashlib

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pipeline_mf_etl_spark.sources.zstdframe import (
        encode_zstd_seekable,
        read_zstd_seek_table,
        zstd_seek_read,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("n_frames", LongType(), False),
            StructField("content_size", LongType(), False),
            StructField("frames_touched", LongType(), False),
            StructField("slice_md5", StringType(), False),
            StructField("slice_text", StringType(), False),
        ]
    )

    def feats(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                content = ((text + "\n") * 3).encode("utf-8")
                arc = encode_zstd_seekable(
                    content,
                    frame_content_size=_SEEK_FRAME,
                    block_size=_SEEK_FRAME,  # one block per frame
                )
                table = read_zstd_seek_table(arc)
                total = sum(e["d_size"] for e in table)
                off = len(content) // 3
                ln = min(_SEEK_SLICE, total - off)
                # snap the slice end DOWN to a UTF-8 char boundary so
                # slice_text always decodes (the start is a copy
                # boundary by construction); a no-op on ASCII corpora,
                # mirrored byte-for-byte in the oracle's CASE ladder
                while (
                    ln > 0
                    and off + ln < total
                    and (content[off + ln] & 0xC0) == 0x80
                ):
                    ln -= 1
                sl = zstd_seek_read(arc, off, ln)
                if sl != content[off : off + ln]:
                    raise ValueError("seekable range read disagrees with content")
                touched = sum(
                    1
                    for e in table
                    if ln > 0
                    and e["d_off"] < off + ln
                    and e["d_off"] + e["d_size"] > off
                )
                rows.append(
                    (
                        int(doc_id),
                        len(table),
                        total,
                        touched,
                        hashlib.md5(sl).hexdigest(),
                        sl.decode("utf-8"),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "text").mapInPandas(feats, schema)


# the slice starts at byte len(text)+1 (content is exactly 3 copies of
# text||\n, so offset = one copy) and runs min(256, 2*(len+1)) bytes,
# snapped down to a UTF-8 char boundary (engine mirror above); frames
# are 512 decompressed bytes, so the touched count is pure interval
# arithmetic. BYTE-exact on any corpus (r13 verdict task 5): sizes via
# strlen (bytes), the slice via hex-pair extraction on the UTF-8
# encoding (idiom documented atop queries/multimodal.py), the boundary
# snap as a 4-step CASE ladder over continuation bytes (UTF-8 chars
# are at most 4 bytes, so at most 3 snaps).
C8_ORACLE = f"""
    WITH geo AS (
        SELECT doc_id,
               hex(encode(repeat(text || chr(10), 3))) AS hx,
               3 * (strlen(text) + 1) AS total,
               strlen(text) + 1 AS off
        FROM documents
    ), raw AS (
        SELECT doc_id, hx, total, off,
               LEAST({_SEEK_SLICE}, total - off) AS ln0
        FROM geo
    ), snap AS (
        SELECT doc_id, hx, total, off,
               CASE
                 WHEN ln0 <= 0 THEN ln0
                 WHEN off + ln0 >= total
                   OR (CAST('0x' || substring(hx, 2 * (off + ln0) + 1, 2)
                       AS INTEGER) & 192) != 128 THEN ln0
                 WHEN off + ln0 - 1 >= total
                   OR (CAST('0x' || substring(hx, 2 * (off + ln0 - 1) + 1, 2)
                       AS INTEGER) & 192) != 128 THEN ln0 - 1
                 WHEN off + ln0 - 2 >= total
                   OR (CAST('0x' || substring(hx, 2 * (off + ln0 - 2) + 1, 2)
                       AS INTEGER) & 192) != 128 THEN ln0 - 2
                 ELSE ln0 - 3
               END AS ln
        FROM raw
    ), sl AS (
        SELECT doc_id, total, off, ln,
               decode(unhex(substring(hx, 2 * off + 1, 2 * ln))) AS slice
        FROM snap
    )
    SELECT doc_id,
           CAST((total + {_SEEK_FRAME} - 1) // {_SEEK_FRAME} AS BIGINT)
               AS n_frames,
           CAST(total AS BIGINT) AS content_size,
           CAST(CASE WHEN ln <= 0 THEN 0
                     ELSE (off + ln - 1) // {_SEEK_FRAME}
                          - off // {_SEEK_FRAME} + 1 END AS BIGINT)
               AS frames_touched,
           md5(slice) AS slice_md5,
           slice AS slice_text
    FROM sl
"""


# ---------------------------------------------------------------------------
# c6 — framed-Snappy shard extraction (sources/snappyframe.py: the
# other data-lake compression next to LZ4; raw-block tags + framing
# chunks with masked CRC-32C everywhere)
# ---------------------------------------------------------------------------


def c6_snappy_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode one framed Snappy stream per document (content =
    ``text\\n`` x3; a skippable padding chunk every 7th doc, the
    uncompressed-chunk path forced every 5th) through the CRC-verified
    walk; emit chunk accounting + content integrity. Map-only Arrow
    pass. n_uncompressed_chunks stays OFF this query — compressibility
    is a compressor property SQL cannot replay (tests/test_snappy.py
    asserts it instead)."""
    from pipeline_mf_etl_spark.sources.snappyframe import (
        extract_snappy_documents,
        with_snappy_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ext = extract_snappy_documents(with_snappy_payload(docs))
    return ext.select(
        "doc_id",
        "n_chunks",
        "n_skipped_chunks",
        "content_size",
        "content_md5",
        "text_out",
        "forced_raw",
    )


C6_ORACLE = """
    SELECT doc_id,
           CAST((3 * (length(text) + 1) + 1023) // 1024 AS BIGINT) AS n_chunks,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_skipped_chunks,
           CAST(3 * (length(text) + 1) AS BIGINT) AS content_size,
           md5(repeat(text || chr(10), 3)) AS content_md5,
           text AS text_out,
           doc_id % 5 = 0 AS forced_raw
    FROM documents
"""


# Registrations live at the bottom because each oracle is assembled
# from SQL-fragment helpers defined between the builders above (the
# decorator form would need the oracle text before the function).
# ---------------------------------------------------------------------------
# c9 — multistream bzip2 extraction (sources/bzip2.py: the container
# Wikipedia dumps ship in — full RLE1/BWT/MTF/Huffman decode with
# per-block and per-stream CRC verification, cross-validated against
# stdlib bz2 in both directions by tests/test_bzip2.py; registered
# r13). The multistream split (independent byte-aligned streams, the
# dump index's record-grain access primitive) is what a 1000-executor
# ingest parallelizes on — the same role gzip members play in c1.
# Reference analog: ingest/read_txt.py:97-186 (file-grain
# decompression feeding the ingest layer).
# ---------------------------------------------------------------------------


def c9_bzip2_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode one multistream bzip2 payload per document (2 + doc_id%2
    independent streams of ``text\\n`` each, level digit cycling
    1 + doc_id%9, 512-byte blocks) through the fully verified walk and
    emit stream/block accounting + content integrity. Map-only Arrow
    pass; the oracle replays the stream arithmetic BYTE-exactly
    (strlen, not length — the r12 non-ASCII convention) and the md5
    from the characters."""
    from pipeline_mf_etl_spark.sources.bzip2 import (
        extract_bzip2_documents,
        with_bzip2_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_bzip2_documents(with_bzip2_payload(docs))


C9_ORACLE = """
    SELECT doc_id,
           CAST(2 + doc_id % 2 AS BIGINT) AS n_streams,
           CAST((2 + doc_id % 2) * ((strlen(text) + 1 + 511) // 512)
               AS BIGINT) AS n_blocks,
           CAST(1 + doc_id % 9 AS BIGINT) AS level,
           CAST((2 + doc_id % 2) * (strlen(text) + 1) AS BIGINT)
               AS content_size,
           md5(repeat(text || chr(10), 2 + doc_id % 2)) AS content_md5,
           text AS text_out
    FROM documents
"""


query("c1_warc_extract", oracle=C1_ORACLE)(c1_warc_extract)
query("c2_zip_extract", oracle=C2_ORACLE)(c2_zip_extract)
query("c3_pdf_extract", oracle=C3_ORACLE)(c3_pdf_extract)
query("c4_avro_extract", oracle=C4_ORACLE)(c4_avro_extract)
query("c5_lz4_extract", oracle=C5_ORACLE)(c5_lz4_extract)
query("c6_snappy_extract", oracle=C6_ORACLE)(c6_snappy_extract)
query("c7_zstd_extract", oracle=C7_ORACLE)(c7_zstd_extract)
query("c8_seekable_extract", oracle=C8_ORACLE)(c8_seekable_extract)
query("c9_bzip2_extract", oracle=C9_ORACLE)(c9_bzip2_extract)
query("t15_html_extract", oracle=T15_ORACLE)(t15_html_extract)
query("wd1_webdataset_roundtrip", oracle=WD1_ORACLE)(wd1_webdataset_roundtrip)


# ---------------------------------------------------------------------------
# c10 — seekable-zstd shard corpus round-trip (sources/corpus_io.py,
# built r13; registered for the r14 window). Certifies the WHOLE shard
# layout end to end: the corpus is written as seekable archives + a
# doc-level byte-range index in one shard-parallel job, then EVERY doc
# is fetched back through the three-range-GET point-lookup path
# (footer probe, seek table, covering frames only) and must equal the
# source table byte for byte. The oracle is the identity — the layout
# must be lossless.
# ---------------------------------------------------------------------------


def c10_shard_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents corpus into the seekable-zstd shard layout,
    then point-look-up every doc via its byte-range index entry.
    EAGER: the shard write runs at build time (tempdir scratch)."""
    import tempfile

    from pipeline_mf_etl_spark.sources.corpus_io import (
        read_jsonl_zst_docs,
        write_jsonl_zst_corpus,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="c10_")
    # shard count follows the session's parallelism (floored at 4):
    # the encode is shard-grain parallel, so 4 fixed shards pinned the
    # 10x-scale build to 4 cores (124s at sf0.1; ~4x better at 16) —
    # and a real 100-TB corpus ships thousands of shards regardless.
    # The identity oracle is layout-independent by construction.
    n_shards = max(4, spark.sparkContext.defaultParallelism)
    index = write_jsonl_zst_corpus(docs, root, n_shards=n_shards)
    return read_jsonl_zst_docs(index, root)


C10_ORACLE = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

query("c10_shard_lookup", eager=True, oracle=C10_ORACLE)(c10_shard_lookup)


# ---------------------------------------------------------------------------
# c11 — .xz / LZMA2 extraction (sources/xz.py, built r13; registered
# for the r14 window behind c10). The one corpus container where the
# engine is DECODE-only by design: synthesis compresses each doc with
# CPython's stdlib lzma (liblzma), so every document the query touches
# cross-validates our range-coder/LZMA2/container walk against real
# liblzma output — presets, multistream concatenation, and all three
# integrity check types cycle by doc_id. Reference analog:
# ingest/read_txt.py:97-186 (file-grain decompression).
# ---------------------------------------------------------------------------


def c11_xz_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode one multistream .xz payload per document (1 + doc_id%2
    liblzma streams of ``text\\n``, check type cycling
    crc32/crc64/sha256) through the fully verified walk and emit
    stream/block accounting + content integrity. Map-only Arrow pass;
    byte-exact (strlen) oracle."""
    from pipeline_mf_etl_spark.sources.xz import (
        extract_xz_documents,
        with_xz_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_xz_documents(with_xz_payload(docs))


C11_ORACLE = """
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_streams,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_blocks,
           CASE doc_id % 3 WHEN 0 THEN 'crc32' WHEN 1 THEN 'crc64'
                ELSE 'sha256' END AS "check",
           CAST((1 + doc_id % 2) * (strlen(text) + 1) AS BIGINT)
               AS content_size,
           md5(repeat(text || chr(10), 1 + doc_id % 2)) AS content_md5,
           text AS text_out
    FROM documents
"""

query("c11_xz_extract", oracle=C11_ORACLE)(c11_xz_extract)


# ---------------------------------------------------------------------------
# c12 — bzip2 dump-index point-lookup (sources/bzip2.py decode_bzip2_at
# + sources/corpus_io.py write_jsonl_bz2_dump; r13 verdict task 9).
# Certifies the Wikipedia-multistream access pattern end to end: the
# corpus is written as shards of independent byte-aligned bzip2 streams
# (16 JSONL docs per stream) with a per-document (offset, length,
# line_no) index — the shape the public dump index publishes — then
# EVERY doc is fetched back by range-reading ONLY its stream's bytes
# and decoding that one stream through the CRC-verified walk. The
# oracle is the identity — the layout must be lossless. This is the
# executor-unit COVERAGE.md advertises for multistream dumps, now
# driver-certified like c10 did for seekable-zstd.
# ---------------------------------------------------------------------------


def c12_bz2_dump_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents corpus into the multistream bzip2 dump
    layout, then point-look-up every doc via its dump-index entry
    (per-stream range read, single-stream decode, line pick). EAGER:
    the dump write runs at build time (tempdir scratch)."""
    import tempfile

    from pipeline_mf_etl_spark.sources.corpus_io import (
        read_jsonl_bz2_docs,
        write_jsonl_bz2_dump,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="c12_")
    # shard-grain parallel encode, same parallelism rule as c10
    n_shards = max(4, spark.sparkContext.defaultParallelism)
    index = write_jsonl_bz2_dump(
        docs, root, n_shards=n_shards, docs_per_stream=16
    )
    return read_jsonl_bz2_docs(index, root)


C12_ORACLE = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

query("c12_bz2_dump_lookup", eager=True, oracle=C12_ORACLE)(c12_bz2_dump_lookup)


# ---------------------------------------------------------------------------
# c13 — TFRecord shard-corpus round-trip (sources/tfrecord.py +
# sources/corpus_io.py, round 14). Certifies the TRAINING-CONTAINER
# export surface end to end: the corpus is written as TFRecord shards
# (one tf.Example per doc, masked-CRC32C framing — the format TF data
# loaders consume directly) plus a doc-level byte-range index in one
# shard-parallel job, then EVERY doc is fetched back through the
# range-read point-lookup path (seek + bounded read, both CRCs and the
# strict protobuf walk verified per record) and must equal the source
# table byte for byte. The oracle is the identity — the layout must be
# lossless. Same family as c10 (seekable-zstd) and c12 (bzip2 dump);
# reference analog: none (engine ADDITION for the training pipeline).
# ---------------------------------------------------------------------------


def c13_tfrecord_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents corpus into the TFRecord shard layout, then
    point-look-up every doc via its byte-range index entry. EAGER: the
    shard write runs at build time (tempdir scratch)."""
    import tempfile

    from pipeline_mf_etl_spark.sources.corpus_io import (
        read_tfrecord_docs,
        write_tfrecord_corpus,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="c13_")
    # shard-grain parallel encode, same parallelism rule as c10/c12
    n_shards = max(4, spark.sparkContext.defaultParallelism)
    index = write_tfrecord_corpus(docs, root, n_shards=n_shards)
    return read_tfrecord_docs(index, root)


C13_ORACLE = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

query("c13_tfrecord_lookup", eager=True, oracle=C13_ORACLE)(c13_tfrecord_lookup)


# ---------------------------------------------------------------------------
# c14 — Arrow IPC shard-corpus round-trip (sources/arrowipc.py +
# sources/corpus_io.py, round 14). Certifies the HuggingFace-datasets
# interchange end to end: the corpus is written as Feather-V2 ``.arrow``
# shards (dependency-free FlatBuffers/columnar encode, real pyarrow
# reads every byte — tests/test_arrowipc.py) plus a (shard, batch, row)
# index, then EVERY doc is fetched back through the footer random-access
# path (10-byte tail probe + footer + covering block only) and must
# equal the source table byte for byte. The oracle is the identity —
# the layout must be lossless. Same family as c10/c12/c13; reference
# analog: none (engine ADDITION for the training pipeline).
# ---------------------------------------------------------------------------


def c14_arrow_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents corpus into the Arrow IPC shard layout, then
    point-look-up every doc via its (shard, batch, row) index entry.
    EAGER: the shard write runs at build time (tempdir scratch)."""
    import tempfile

    from pipeline_mf_etl_spark.sources.corpus_io import (
        read_arrow_docs,
        write_arrow_corpus,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="c14_")
    # shard-grain parallel encode, same parallelism rule as c10/c12/c13
    n_shards = max(4, spark.sparkContext.defaultParallelism)
    index = write_arrow_corpus(docs, root, n_shards=n_shards, batch_rows=64)
    return read_arrow_docs(index, root)


C14_ORACLE = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

query("c14_arrow_lookup", eager=True, oracle=C14_ORACLE)(c14_arrow_lookup)


# ---------------------------------------------------------------------------
# c15 — safetensors embedding-shard round-trip (sources/safetensors.py
# + sources/corpus_io.py, round 14). Certifies the HF tensor container
# as the EMBEDDINGS interchange: the embeddings table is written as
# safetensors shards (vec_id/label/embedding tensors + strict
# tile-the-data-region validation) plus a (vec_id, shard, row) index,
# then EVERY row is fetched back by pure offset arithmetic (header
# probe + three bounded range reads — no framing walk) and must equal
# the source, value for value, posexploded to scalar grain so the hash
# compares float-by-float. Same family as c13/c14; reference analog:
# none (engine ADDITION for the training pipeline).
# ---------------------------------------------------------------------------


def c15_safetensors_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the embeddings table into the safetensors shard layout,
    row-look-up every vector via its index entry, and posexplode to
    (vec_id, label, pos, val) scalar grain. EAGER: the shard write
    runs at build time (tempdir scratch)."""
    import tempfile

    from pipeline_mf_etl_spark.sources.corpus_io import (
        read_safetensors_rows,
        write_safetensors_corpus,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="c15_")
    n_shards = max(4, spark.sparkContext.defaultParallelism)
    index = write_safetensors_corpus(emb, root, n_shards=n_shards)
    fetched = read_safetensors_rows(index, root)
    return fetched.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id", "label", F.col("pos").cast("bigint").alias("pos"), "val"
    )


C15_ORACLE = """
    SELECT vec_id, label,
           CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
           unnest(embedding) AS val
    FROM embeddings
"""

query("c15_safetensors_lookup", eager=True, oracle=C15_ORACLE)(
    c15_safetensors_lookup
)


# ---------------------------------------------------------------------------
# c16 — npz embedding-shard round-trip (sources/npy.py +
# sources/corpus_io.py, round 14). The np.save/np.savez interchange
# certified end to end: embeddings written as uncompressed .npz shards
# (our .npy bytes are BYTE-IDENTICAL to np.save's; np.load reads every
# shard — tests/test_npy.py) + a (vec_id, shard, row) index, every row
# fetched back via the ZIP central-directory walk + offset arithmetic
# into the STORED members, posexploded to scalar grain like c15. The
# oracle is the identity. Registered at the _PRIORITY tail (first
# driver exposure with the r15 rotation, like o20) so it displaces no
# r14 re-certification.
# ---------------------------------------------------------------------------


def c16_npz_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the embeddings table into the npz shard layout, row-look-up
    every vector via its index entry, and posexplode to (vec_id, label,
    pos, val) scalar grain. EAGER: the shard write runs at build time
    (tempdir scratch)."""
    import tempfile

    from pipeline_mf_etl_spark.sources.corpus_io import (
        read_npz_rows,
        write_npz_corpus,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="c16_")
    n_shards = max(4, spark.sparkContext.defaultParallelism)
    index = write_npz_corpus(emb, root, n_shards=n_shards)
    fetched = read_npz_rows(index, root)
    return fetched.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id", "label", F.col("pos").cast("bigint").alias("pos"), "val"
    )


query("c16_npz_lookup", eager=True, oracle=C15_ORACLE)(c16_npz_lookup)
