"""JSONL corpus source/sink: round-trip fidelity, explicit-schema read,
corrupt-line rejects side-channel, missing-key semantics."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from pipeline_mf_etl_spark.sources.corpus_io import (
    DOCUMENTS_SCHEMA,
    read_jsonl_corpus,
    write_jsonl_corpus,
)
from pipeline_mf_etl_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_jsonl_roundtrip_documents(spark, tmp_path):
    """documents → JSONL.gz → documents must be lossless (same rows,
    same types), with zero rejects on clean data."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl_corpus(docs, out)
    assert glob.glob(os.path.join(out, "*.json.gz")), "expected gzip part files"

    valid, rejects = read_jsonl_corpus(spark, out)
    assert rejects.count() == 0
    assert valid.schema == DOCUMENTS_SCHEMA
    orig = {tuple(r) for r in docs.select(*[f.name for f in DOCUMENTS_SCHEMA]).collect()}
    back = {tuple(r) for r in valid.collect()}
    assert back == orig


def test_jsonl_rejects_side_channel(spark, tmp_path):
    """Malformed JSON and type-conflicting rows land in rejects with
    their raw bytes; valid-but-sparse rows stay valid with nulls."""
    p = tmp_path / "corpus"
    p.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "good", "lang": "en", "source": "a", "n_chars": 4}),
        '{"doc_id": 2, "text": "unterminated',          # not JSON
        json.dumps({"doc_id": "NaN?", "text": "bad type"}),  # doc_id not a long
        json.dumps({"doc_id": 4}),                      # missing keys = nulls, valid
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    valid, rejects = read_jsonl_corpus(spark, str(p))
    vrows = {r["doc_id"]: r for r in valid.collect()}
    assert set(vrows) == {1, 4}
    assert vrows[4]["text"] is None  # sparse, not rejected
    rrows = rejects.collect()
    assert {r["reason"] for r in rrows} == {"BAD_JSON"}
    raws = [r["raw_line"] for r in rrows]
    assert any("unterminated" in r for r in raws)
    assert any("NaN?" in r for r in raws)


def test_jsonl_uncompressed_splittable_and_infer(spark, tmp_path):
    """compression=None emits plain .json parts (splittable on re-read);
    schema=None takes the documented inference path."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    out = str(tmp_path / "plain")
    write_jsonl_corpus(docs, out, compression=None)
    parts = glob.glob(os.path.join(out, "part-*"))
    assert parts and not any(f.endswith(".gz") for f in parts)

    valid, rejects = read_jsonl_corpus(spark, out, schema=None)
    assert rejects.count() == 0
    assert valid.count() == 20
    assert valid.filter(F.col("text").isNull()).count() == 0


def test_jsonl_stream_matches_batch_read(spark, tmp_path):
    """Streaming the JSONL drop-zone (availableNow, one file per
    trigger) must yield exactly the batch reader's valid/reject split —
    including corrupt lines planted across separate shard files."""
    import json as _json

    from pipeline_mf_etl_spark.streaming import read_jsonl_corpus_stream

    zone = tmp_path / "dropzone"
    zone.mkdir()
    (zone / "shard-0.jsonl").write_text(
        "\n".join(
            _json.dumps(
                {"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s", "n_chars": 5}
            )
            for i in range(5)
        )
        + "\n"
    )
    (zone / "shard-1.jsonl").write_text(
        '{"doc_id": 100, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        '{"doc_id": broken\n'
        '{"doc_id": 101}\n'
    )

    stream = read_jsonl_corpus_stream(spark, str(zone))
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from jsonl_ingest").collect()

    valid_b, rejects_b = read_jsonl_corpus(spark, str(zone))
    valid_s = {tuple(r) for r in got if r["_corrupt_record"] is None}
    # the stream's valid rows carry the trailing corrupt column; strip it
    valid_s = {t[:-1] for t in valid_s}
    assert valid_s == {tuple(r) for r in valid_b.collect()}
    assert len(valid_s) == 7
    rej_s = sorted(r["_corrupt_record"] for r in got if r["_corrupt_record"] is not None)
    assert rej_s == sorted(r["raw_line"] for r in rejects_b.collect())
    assert len(rej_s) == 1 and "broken" in rej_s[0]


def test_jsonl_gzip_lines_parse_standalone(tmp_path, spark):
    """The .gz parts are genuine JSONL: gunzip + json.loads per line
    succeeds outside Spark (interchange-format contract)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    out = str(tmp_path / "gz")
    write_jsonl_corpus(docs, out)
    n = 0
    for part in glob.glob(os.path.join(out, "*.json.gz")):
        with gzip.open(part, "rt") as fh:
            for line in fh:
                obj = json.loads(line)
                assert "doc_id" in obj
                n += 1
    assert n == 5


class TestSeekableZstCorpus:
    def _write(self, spark, tmp_path, n_docs=40):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            write_jsonl_zst_corpus,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(
            n_docs
        )
        out = str(tmp_path / "zstcorpus")
        # small frames so every doc's byte range spans framing decisions
        index = write_jsonl_zst_corpus(
            docs, out, n_shards=3, frame_content_size=512
        )
        return docs, out, index

    def test_every_doc_point_lookup_round_trips(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_jsonl_zst_doc

        docs, out, index = self._write(spark, tmp_path)
        want = {r["doc_id"]: r.asDict() for r in docs.collect()}
        rows = index.collect()
        assert len(rows) == len(want)
        for r in rows:
            got = read_jsonl_zst_doc(
                f"{out}/{r['shard']}", r["offset"], r["length"]
            )
            assert got == want[got["doc_id"]], got["doc_id"]

    def test_distributed_lookup_matches_source(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_jsonl_zst_docs

        docs, out, index = self._write(spark, tmp_path)
        fetched = read_jsonl_zst_docs(index, out)
        a = sorted(tuple(r) for r in fetched.collect())
        b = sorted(tuple(r) for r in docs.collect())
        assert a == b

    def test_corrupting_an_untouched_frame_leaves_lookups_intact(
        self, spark, tmp_path
    ):
        """The range-read guarantee: only COVERING frames are read and
        checksum-verified, so flipping a byte in a frame outside a
        doc's range neither fails nor changes that doc's lookup — while
        a lookup INTO the corrupted frame is loud."""
        import pytest as _pytest

        from pipeline_mf_etl_spark.sources.corpus_io import read_jsonl_zst_doc
        from pipeline_mf_etl_spark.sources.zstdframe import (
            read_zstd_seek_table,
        )

        docs, out, index = self._write(spark, tmp_path)
        # hash assignment can leave a shard empty; probe the fullest one
        by_shard: dict[str, list] = {}
        for r in index.collect():
            by_shard.setdefault(r["shard"], []).append(r)
        rows = sorted(
            max(by_shard.values(), key=len), key=lambda r: r["offset"]
        )
        assert len(rows) >= 4
        shard = f"{out}/{rows[0]['shard']}"
        payload = bytearray(open(shard, "rb").read())
        table = read_zstd_seek_table(bytes(payload))
        assert len(table) >= 2  # 512-byte frames over multiple docs
        # corrupt the LAST data frame's interior
        last = table[-1]
        payload[last["c_off"] + last["c_size"] // 2] ^= 0xFF
        open(shard, "wb").write(bytes(payload))
        # docs fully inside earlier frames still read fine
        first = rows[0]
        got = read_jsonl_zst_doc(shard, first["offset"], first["length"])
        assert got["doc_id"] == first["doc_id"]
        # a doc covering the corrupted frame fails loudly
        tail_doc = rows[-1]
        if tail_doc["offset"] + tail_doc["length"] > last["d_off"]:
            with _pytest.raises(ValueError):
                read_jsonl_zst_doc(
                    shard, tail_doc["offset"], tail_doc["length"]
                )

    def test_nonascii_docs_round_trip(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_jsonl_zst_doc,
            write_jsonl_zst_corpus,
        )

        df = spark.createDataFrame(
            [
                (1, "héllo — 日本語 🎉", "fr", "web", 13),
                (2, None, None, "dump", None),  # nullable contract fields
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = str(tmp_path / "nz")
        index = write_jsonl_zst_corpus(df, out, n_shards=1)
        for r in index.collect():
            doc = read_jsonl_zst_doc(f"{out}/{r['shard']}", r["offset"], r["length"])
            if doc["doc_id"] == 1:
                assert doc["text"] == "héllo — 日本語 🎉"
            else:
                assert doc["text"] is None and doc["n_chars"] is None


class TestOrderedTrainingExport:
    """r13 verdict task 7: o15_shard_shuffle's training-order assignment
    shipped through the seekable shard layout, round-tripped via point
    lookups."""

    def _export(self, spark, tmp_path):
        from pipeline_mf_etl_spark.queries import all_queries
        from pipeline_mf_etl_spark.queries.corpus import _O15_SHARDS
        from pipeline_mf_etl_spark.sources.corpus_io import (
            export_ordered_jsonl_zst,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        sf = "/root/testdata/sf0.001"
        docs = load_table(spark, sf, "documents")
        order = all_queries()["o15_shard_shuffle"].spark(spark, sf)
        out = str(tmp_path / "training_shards")
        index = export_ordered_jsonl_zst(
            docs, order, out, n_shards=_O15_SHARDS, frame_content_size=512
        )
        return docs, order, out, index

    def test_files_follow_assignment_and_order(self, spark, tmp_path):
        """Each o15 shard becomes exactly one archive named by its
        shard VALUE, whose decoded lines are the shard's docs in pos
        order — the read order a trainer replays."""
        import glob as _glob
        import json
        import os

        from pipeline_mf_etl_spark.sources.zstdframe import zstd_seek_read

        docs, order, out, index = self._export(spark, tmp_path)
        assign = {
            r["doc_id"]: (r["shard"], r["pos"]) for r in order.collect()
        }
        shards = sorted(_glob.glob(os.path.join(out, "shard-*.jsonl.zst")))
        assert len(shards) == len({s for s, _ in assign.values()})
        seen = 0
        for path in shards:
            s = int(os.path.basename(path).split("-")[1].split(".")[0])
            with open(path, "rb") as fh:
                payload = fh.read()
            from pipeline_mf_etl_spark.sources.zstdframe import (
                read_zstd_seek_table,
            )

            table = read_zstd_seek_table(payload)
            total = table[-1]["d_off"] + table[-1]["d_size"]
            content = zstd_seek_read(payload, 0, total)
            doc_ids = [
                json.loads(line)["doc_id"]
                for line in content.decode("utf-8").splitlines()
            ]
            want = [
                d
                for d, (sh, _) in sorted(
                    assign.items(), key=lambda kv: kv[1][1]
                )
                if sh == s
            ]
            assert doc_ids == want, path
            seen += len(doc_ids)
        assert seen == len(assign)

    def test_point_lookups_round_trip_every_doc(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_jsonl_zst_doc,
            read_jsonl_zst_docs,
        )

        docs, order, out, index = self._export(spark, tmp_path)
        want = {r["doc_id"]: r.asDict() for r in docs.collect()}
        rows = index.collect()
        assert len(rows) == len(want)
        for r in rows[:25]:  # spot single lookups; the map pass does all
            got = read_jsonl_zst_doc(
                f"{out}/{r['shard']}", r["offset"], r["length"]
            )
            assert got == want[got["doc_id"]]
        fetched = read_jsonl_zst_docs(index, out)
        a = sorted(tuple(r) for r in fetched.collect())
        b = sorted(tuple(r) for r in docs.collect())
        assert a == b


class TestNonAsciiAndNullLayouts:
    """Non-ASCII + nullable-field round-trips for the r14 layout
    writers (the zst-corpus writer's test above is the template)."""

    _ROWS = [
        (1, "héllo — 日本語 🎉", "fr", "web", 13),
        (2, None, None, "dump", None),
        (3, "кириллица мixed", "ru", "web", 15),
    ]
    _SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

    def test_bz2_dump_nonascii_round_trip(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_jsonl_bz2_docs,
            write_jsonl_bz2_dump,
        )

        df = spark.createDataFrame(self._ROWS, self._SCHEMA)
        out = str(tmp_path / "nz_bz2")
        index = write_jsonl_bz2_dump(df, out, n_shards=2, docs_per_stream=2)
        got = {r["doc_id"]: r.asDict() for r in read_jsonl_bz2_docs(index, out).collect()}
        assert got[1]["text"] == "héllo — 日本語 🎉"
        assert got[2]["text"] is None and got[2]["n_chars"] is None
        assert got[3]["lang"] == "ru"

    def test_ordered_export_nonascii_round_trip(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            export_ordered_jsonl_zst,
            read_jsonl_zst_docs,
        )

        df = spark.createDataFrame(self._ROWS, self._SCHEMA)
        order = spark.createDataFrame(
            [(0, 1, 2), (0, 2, 1), (1, 3, 1)], "shard int, doc_id long, pos int"
        )
        out = str(tmp_path / "nz_ord")
        index = export_ordered_jsonl_zst(df, order, out, n_shards=2)
        got = {r["doc_id"]: r.asDict() for r in read_jsonl_zst_docs(index, out).collect()}
        assert got[1]["text"] == "héllo — 日本語 🎉"
        assert got[2]["text"] is None
        # pos order within shard 0: doc 2 (pos 1) precedes doc 1 (pos 2)
        idx = {r["doc_id"]: r for r in index.collect()}
        assert idx[2]["shard"] == idx[1]["shard"]
        assert idx[2]["offset"] < idx[1]["offset"]


class TestBz2DumpIndex:
    """r13 verdict task 9: the Wikipedia-multistream dump layout —
    byte-aligned bzip2 streams + per-doc (offset, length, line_no)
    index — certified through range-read single-stream decodes."""

    def _write(self, spark, tmp_path, n_docs=40):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            write_jsonl_bz2_dump,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(
            n_docs
        )
        out = str(tmp_path / "bz2dump")
        # 7 docs/stream so shards hold several streams each
        index = write_jsonl_bz2_dump(
            docs, out, n_shards=3, docs_per_stream=7
        )
        return docs, out, index

    def test_streams_are_stdlib_decodable_at_published_offsets(
        self, spark, tmp_path
    ):
        """Each index byte range is an INDEPENDENT stream libbzip2
        itself can decode — the property that lets any dump reader,
        not just ours, fan streams out to tasks."""
        import bz2 as stdlib_bz2
        import json
        import os

        docs, out, index = self._write(spark, tmp_path)
        want = {r["doc_id"]: r.asDict() for r in docs.collect()}
        seen = set()
        for r in index.collect():
            with open(os.path.join(out, r["shard"]), "rb") as fh:
                fh.seek(r["offset"])
                data = fh.read(r["length"])
            lines = stdlib_bz2.decompress(data).decode().splitlines()
            doc = json.loads(lines[r["line_no"]])
            assert doc == want[doc["doc_id"]]
            seen.add(doc["doc_id"])
        assert seen == set(want)

    def test_distributed_lookup_matches_source(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_jsonl_bz2_docs,
        )

        docs, out, index = self._write(spark, tmp_path)
        fetched = read_jsonl_bz2_docs(index, out)
        a = sorted(tuple(r) for r in fetched.collect())
        b = sorted(tuple(r) for r in docs.collect())
        assert a == b

    def test_corruption_isolated_to_its_stream(self, spark, tmp_path):
        """Flipping a byte inside one stream must not affect lookups
        into OTHER streams of the same shard (independent-stream
        grain), while lookups into the corrupted stream are loud."""
        import os

        import pytest as _pytest

        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_jsonl_bz2_docs,
        )

        docs, out, index = self._write(spark, tmp_path)
        rows = index.collect()
        by_shard: dict[str, set] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], set()).add(
                (r["offset"], r["length"])
            )
        shard, streams = max(by_shard.items(), key=lambda kv: len(kv[1]))
        assert len(streams) >= 2, "need a multi-stream shard to isolate"
        victim = sorted(streams)[0]
        path = os.path.join(out, shard)
        blob = bytearray(open(path, "rb").read())
        blob[victim[0] + victim[1] // 2] ^= 0xFF  # mid-stream payload flip
        open(path, "wb").write(bytes(blob))
        # NB: index.offset would resolve to DataFrame.offset (the SQL
        # OFFSET method, new in Spark 4) — bracket access is required
        hit = (index["shard"] == shard) & (index["offset"] == victim[0])
        good = index.filter(~hit)
        bad = index.filter(hit)
        fetched = sorted(
            tuple(r)
            for r in read_jsonl_bz2_docs(good, out).collect()
        )
        good_ids = {r["doc_id"] for r in good.collect()}
        src = sorted(
            tuple(r)
            for r in docs.collect()
            if r["doc_id"] in good_ids
        )
        assert fetched == src
        with _pytest.raises(Exception):
            read_jsonl_bz2_docs(bad, out).collect()


def test_c12_bz2_dump_lookup_matches_identity_oracle(spark, duck):
    """The registered dump-index round-trip (r14 window head): write the
    corpus as multistream bzip2 shards + dump index, point-look-up every
    doc, and the result must equal the source table exactly."""
    import math

    from pipeline_mf_etl_spark.queries import all_queries

    spec = all_queries()["c12_bz2_dump_lookup"]
    sdf = spec.spark(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert len(srows) == 500


def test_c10_shard_lookup_matches_identity_oracle(spark, duck):
    """The registered shard-layout round-trip (r14 window head): write
    the corpus as seekable archives + byte-range index, point-look-up
    every doc, and the result must equal the source table exactly."""
    import math

    from pipeline_mf_etl_spark.queries import all_queries

    spec = all_queries()["c10_shard_lookup"]
    sdf = spec.spark(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert len(srows) == 500


class TestTFRecordShardCorpus:
    """TFRecord shard layout (round 14): framing + tf.Example through
    the Spark corpus path — write shards + index, full scan, point
    lookups, gzip members, and record-grain corruption isolation."""

    def _write(self, spark, tmp_path, compression=None, n_docs=40):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            write_tfrecord_corpus,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(
            n_docs
        )
        out = str(tmp_path / "tfcorpus")
        index = write_tfrecord_corpus(
            docs, out, n_shards=3, compression=compression
        )
        return docs, out, index

    def test_point_lookups_round_trip_every_doc(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_tfrecord_docs

        docs, out, index = self._write(spark, tmp_path)
        fetched = read_tfrecord_docs(index, out)
        a = sorted(tuple(r) for r in fetched.collect())
        b = sorted(tuple(r) for r in docs.collect())
        assert a == b
        assert len(a) == 40

    def test_full_scan_matches_source(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_tfrecord_corpus,
        )

        docs, out, index = self._write(spark, tmp_path)
        scanned = read_tfrecord_corpus(spark, out)
        assert sorted(tuple(r) for r in scanned.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )

    def test_gzip_members_scan_and_lookup(self, spark, tmp_path):
        import os

        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_tfrecord_corpus,
            read_tfrecord_docs,
        )

        docs, out, index = self._write(spark, tmp_path, compression="gzip")
        names = os.listdir(out)
        assert all(
            n.endswith(".tfrecord.gz") for n in names if n.startswith("shard-")
        )
        src = sorted(tuple(r) for r in docs.collect())
        assert sorted(tuple(r) for r in read_tfrecord_corpus(spark, out).collect()) == src
        assert sorted(tuple(r) for r in read_tfrecord_docs(index, out).collect()) == src

    def test_nonascii_and_nulls_round_trip(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_tfrecord_docs,
            write_tfrecord_corpus,
        )

        df = spark.createDataFrame(
            [
                (1, "héllo — 日本語 🎉", "fr", "web", 13),
                (2, None, None, "dump", None),  # NULL -> absent feature
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = str(tmp_path / "tfz")
        index = write_tfrecord_corpus(df, out, n_shards=1)
        got = {r["doc_id"]: r.asDict() for r in read_tfrecord_docs(index, out).collect()}
        assert got[1]["text"] == "héllo — 日本語 🎉"
        assert got[2]["text"] is None and got[2]["n_chars"] is None
        assert got[2]["source"] == "dump"

    def test_corruption_isolated_to_its_record(self, spark, tmp_path):
        """Record-grain isolation: flipping a byte inside ONE framed
        record leaves every other doc's range read intact, fails that
        record's lookup loudly, and fails the full-shard walk."""
        import pytest as _pytest

        from pipeline_mf_etl_spark.sources.corpus_io import read_tfrecord_docs
        from pipeline_mf_etl_spark.sources.tfrecord import read_tfrecord_at

        docs, out, index = self._write(spark, tmp_path)
        by_shard: dict[str, list] = {}
        for r in index.collect():
            by_shard.setdefault(r["shard"], []).append(r)
        rows = sorted(
            max(by_shard.values(), key=len), key=lambda r: r["offset"]
        )
        assert len(rows) >= 4
        victim = rows[-1]
        shard = f"{out}/{victim['shard']}"
        payload = bytearray(open(shard, "rb").read())
        payload[victim["offset"] + victim["length"] // 2] ^= 0xFF
        open(shard, "wb").write(bytes(payload))
        # every untouched record still point-reads clean
        data = bytes(payload)
        for r in rows[:-1]:
            read_tfrecord_at(data[r["offset"] : r["offset"] + r["length"]])
        # the corrupted record is loud, both per-record and via Spark
        with _pytest.raises(ValueError):
            read_tfrecord_at(
                data[victim["offset"] : victim["offset"] + victim["length"]]
            )
        bad = index.where(index.doc_id == victim["doc_id"])
        with _pytest.raises(Exception):
            read_tfrecord_docs(bad, out).collect()


def test_c13_tfrecord_lookup_matches_identity_oracle(spark, duck):
    """The registered TFRecord round-trip (r14 window head): write the
    corpus as tf.Example shards + byte-range index, point-look-up every
    doc, and the result must equal the source table exactly."""
    import math

    from pipeline_mf_etl_spark.queries import all_queries

    spec = all_queries()["c13_tfrecord_lookup"]
    sdf = spec.spark(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert len(srows) == 500


class TestTFRecordGenericSchemas:
    """Schema-driven tf.Example mapping: any integral/string/binary/
    float32/array column set rides the right Feature list — the
    embeddings table's array<float> is the training-export case."""

    def test_embeddings_float32_arrays_round_trip_exactly(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_tfrecord_corpus,
            read_tfrecord_docs,
            write_tfrecord_corpus,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = str(tmp_path / "emb")
        index = write_tfrecord_corpus(
            emb, out, n_shards=2, schema=emb.schema, id_col="vec_id"
        )
        src = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in emb.collect()
        )
        for got in (
            read_tfrecord_docs(index, out, schema=emb.schema),
            read_tfrecord_corpus(spark, out, schema=emb.schema),
        ):
            assert got.schema == emb.schema
            assert (
                sorted(
                    (r["vec_id"], tuple(r["embedding"]), r["label"])
                    for r in got.collect()
                )
                == src
            )

    def test_binary_and_empty_array_round_trip(self, spark, tmp_path):
        from pyspark.sql.types import (
            ArrayType,
            BinaryType,
            FloatType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_tfrecord_docs,
            write_tfrecord_corpus,
        )

        schema = StructType(
            [
                StructField("doc_id", LongType(), True),
                StructField("blob", BinaryType(), True),
                StructField("vec", ArrayType(FloatType()), True),
                StructField("tags", ArrayType(StringType()), True),
            ]
        )
        df = spark.createDataFrame(
            [
                (1, b"\x00\xff raw", [1.5, -2.0], ["a", "ü"]),
                (2, None, [], None),  # empty array stays [], NULL stays NULL
            ],
            schema,
        )
        out = str(tmp_path / "bin")
        index = write_tfrecord_corpus(df, out, n_shards=1, schema=schema)
        got = {
            r["doc_id"]: r.asDict()
            for r in read_tfrecord_docs(index, out, schema=schema).collect()
        }
        assert got[1]["blob"] == b"\x00\xff raw"
        assert got[1]["vec"] == [1.5, -2.0]
        assert got[1]["tags"] == ["a", "ü"]
        assert got[2]["blob"] is None
        assert got[2]["vec"] == [] and got[2]["tags"] is None

    def test_double_columns_rejected_loudly(self, spark, tmp_path):
        import pytest as _pytest

        from pipeline_mf_etl_spark.sources.corpus_io import (
            write_tfrecord_corpus,
        )

        df = spark.createDataFrame([(1, 0.5)], "doc_id long, x double")
        with _pytest.raises(Exception, match="float32"):
            write_tfrecord_corpus(
                df, str(tmp_path / "d"), n_shards=1, schema=df.schema
            )


class TestOrderedTFRecordExport:
    """The TF-loader twin of TestOrderedTrainingExport: o15's
    training-order assignment shipped as TFRecord shards whose records
    replay in pos order, plus point lookups through the byte-range
    index."""

    def _export(self, spark, tmp_path):
        from pipeline_mf_etl_spark.queries import all_queries
        from pipeline_mf_etl_spark.queries.corpus import _O15_SHARDS
        from pipeline_mf_etl_spark.sources.corpus_io import (
            export_ordered_tfrecord,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        sf = "/root/testdata/sf0.001"
        docs = load_table(spark, sf, "documents")
        order = all_queries()["o15_shard_shuffle"].spark(spark, sf)
        out = str(tmp_path / "tf_training_shards")
        index = export_ordered_tfrecord(
            docs, order, out, n_shards=_O15_SHARDS
        )
        return docs, order, out, index

    def test_records_follow_assignment_and_order(self, spark, tmp_path):
        """Each o15 shard becomes exactly one .tfrecord named by its
        shard VALUE whose record walk replays the shard's docs in pos
        order — the sequence a TF input pipeline consumes."""
        import glob as _glob
        import os

        from pipeline_mf_etl_spark.sources.corpus_io import _example_to_row
        from pipeline_mf_etl_spark.sources.corpus_io import (
            _tfrecord_field_plan,
            _utf8_columns,
            DOCUMENTS_SCHEMA,
        )
        from pipeline_mf_etl_spark.sources.tfrecord import iter_tfrecord

        docs, order, out, index = self._export(spark, tmp_path)
        assign = {
            r["doc_id"]: (r["shard"], r["pos"]) for r in order.collect()
        }
        plan = _tfrecord_field_plan(DOCUMENTS_SCHEMA)
        utf8 = _utf8_columns(DOCUMENTS_SCHEMA)
        shards = sorted(_glob.glob(os.path.join(out, "shard-*.tfrecord")))
        assert len(shards) == len({s for s, _ in assign.values()})
        seen = 0
        for path in shards:
            s = int(os.path.basename(path).split("-")[1].split(".")[0])
            with open(path, "rb") as fh:
                data = fh.read()
            doc_ids = [
                _example_to_row(p, plan, utf8)[0]
                for _, _, p in iter_tfrecord(data)
            ]
            want = [
                d
                for d, (sh, _) in sorted(
                    assign.items(), key=lambda kv: kv[1][1]
                )
                if sh == s
            ]
            assert doc_ids == want, path
            seen += len(doc_ids)
        assert seen == len(assign)

    def test_point_lookups_round_trip_every_doc(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_tfrecord_docs,
        )

        docs, order, out, index = self._export(spark, tmp_path)
        rows = index.collect()
        assert len(rows) == docs.count()
        assert all(r["pos"] is not None for r in rows)
        fetched = read_tfrecord_docs(index, out)
        a = sorted(tuple(r) for r in fetched.collect())
        b = sorted(tuple(r) for r in docs.collect())
        assert a == b


class TestArrowShardCorpus:
    """Arrow IPC shard layout (round 14): Feather-V2 shards + (shard,
    batch, row) index through the Spark corpus path."""

    def _write(self, spark, tmp_path, n_docs=40):
        from pipeline_mf_etl_spark.sources.corpus_io import write_arrow_corpus
        from pipeline_mf_etl_spark.sources.readers import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(
            n_docs
        )
        out = str(tmp_path / "arrowcorpus")
        # batch_rows=8 so lookups span multiple random-access blocks
        index = write_arrow_corpus(docs, out, n_shards=3, batch_rows=8)
        return docs, out, index

    def test_point_lookups_round_trip_every_doc(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_arrow_docs

        docs, out, index = self._write(spark, tmp_path)
        assert index.where("batch > 0").count() > 0  # multi-block shards
        fetched = read_arrow_docs(index, out)
        assert sorted(tuple(r) for r in fetched.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )

    def test_full_scan_matches_source(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_arrow_corpus

        docs, out, index = self._write(spark, tmp_path)
        scanned = read_arrow_corpus(spark, out)
        assert sorted(tuple(r) for r in scanned.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )

    def test_shards_are_real_feather_files(self, spark, tmp_path):
        """pyarrow (the cross-validation oracle) must read every shard
        we publish — the layout IS the HuggingFace interchange."""
        import glob as _glob

        import pyarrow.ipc as ipc

        docs, out, index = self._write(spark, tmp_path)
        total = 0
        for p in sorted(_glob.glob(f"{out}/shard-*.arrow")):
            t = ipc.open_file(p).read_all()
            assert t.column_names == [
                "doc_id", "text", "lang", "source", "n_chars"
            ]
            total += t.num_rows
        assert total == 40

    def test_embeddings_schema_round_trips(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_arrow_corpus,
            read_arrow_docs,
            write_arrow_corpus,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = str(tmp_path / "emb_arrow")
        index = write_arrow_corpus(
            emb, out, n_shards=2, batch_rows=32, schema=emb.schema,
            id_col="vec_id",
        )
        src = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in emb.collect()
        )
        for got in (
            read_arrow_docs(index, out, schema=emb.schema),
            read_arrow_corpus(spark, out, schema=emb.schema),
        ):
            assert got.schema == emb.schema
            assert (
                sorted(
                    (r["vec_id"], tuple(r["embedding"]), r["label"])
                    for r in got.collect()
                )
                == src
            )

    def test_nonascii_and_nulls_round_trip(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_arrow_docs,
            write_arrow_corpus,
        )

        df = spark.createDataFrame(
            [
                (1, "héllo — 日本語 🎉", "fr", "web", 13),
                (2, None, None, "dump", None),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = str(tmp_path / "nz_arrow")
        index = write_arrow_corpus(df, out, n_shards=1)
        got = {
            r["doc_id"]: r.asDict()
            for r in read_arrow_docs(index, out).collect()
        }
        assert got[1]["text"] == "héllo — 日本語 🎉"
        assert got[2]["text"] is None and got[2]["n_chars"] is None


def test_c14_arrow_lookup_matches_identity_oracle(spark, duck):
    """The registered Arrow IPC round-trip (r14 window head): write the
    corpus as Feather-V2 shards + (shard, batch, row) index,
    point-look-up every doc, and the result must equal the source table
    exactly."""
    import math

    from pipeline_mf_etl_spark.queries import all_queries

    spec = all_queries()["c14_arrow_lookup"]
    sdf = spec.spark(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert len(srows) == 500


def test_arrow_lookup_on_foreign_dict_encoded_file(spark, tmp_path):
    """read_arrow_docs must serve point lookups on files WE did not
    write — a pyarrow file with a dictionary-encoded lang column (the
    HuggingFace shape), resolved through the footer's dictionary
    blocks."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from pipeline_mf_etl_spark.sources.corpus_io import read_arrow_docs

    langs = ["en", "fr", "de", None, "en", "fr"]
    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(6)], pa.utf8()),
            "lang": pa.array(langs).dictionary_encode(),
            "source": pa.array(["hf"] * 6, pa.utf8()),
            "n_chars": pa.array([5] * 6, pa.int64()),
        }
    )
    out = tmp_path / "foreign"
    out.mkdir()
    with ipc.new_file(str(out / "shard-0.arrow"), t.schema) as w:
        for batch in t.to_batches(max_chunksize=2):
            w.write_batch(batch)
    index = spark.createDataFrame(
        [(i, "shard-0.arrow", i // 2, i % 2) for i in range(6)],
        "doc_id long, shard string, batch long, row long",
    )
    got = {r["doc_id"]: r.asDict() for r in read_arrow_docs(index, str(out)).collect()}
    assert [got[i]["lang"] for i in range(6)] == langs
    assert got[3]["text"] == "doc 3"


class TestSafetensorsShardCorpus:
    """safetensors embedding-shard layout (round 14): tensors + row
    index through the Spark corpus path."""

    def _write(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            write_safetensors_corpus,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = str(tmp_path / "stcorpus")
        index = write_safetensors_corpus(emb, out, n_shards=3)
        return emb, out, index

    def test_row_lookups_round_trip_every_vector(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_safetensors_rows,
        )

        emb, out, index = self._write(spark, tmp_path)
        got = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in read_safetensors_rows(index, out).collect()
        )
        src = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in emb.collect()
        )
        assert got == src and len(got) == 500

    def test_full_scan_matches_source(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import (
            read_safetensors_corpus,
        )

        emb, out, index = self._write(spark, tmp_path)
        got = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in read_safetensors_corpus(spark, out).collect()
        )
        assert got == sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in emb.collect()
        )

    def test_null_cells_reject_loudly(self, spark, tmp_path):
        import pytest as _pytest

        from pipeline_mf_etl_spark.sources.corpus_io import (
            write_safetensors_corpus,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0], None)],
            "vec_id long, embedding array<float>, label int",
        )
        with _pytest.raises(Exception, match="NULL"):
            write_safetensors_corpus(df, str(tmp_path / "bad"), n_shards=1)


def test_c15_safetensors_lookup_matches_identity_oracle(spark, duck):
    """The registered safetensors round-trip (r14 window head): write
    the embeddings table as tensor shards + row index, look up every
    row, posexplode, and the result must equal the source
    float-by-float."""
    import math

    from pipeline_mf_etl_spark.queries import all_queries

    spec = all_queries()["c15_safetensors_lookup"]
    sdf = spec.spark(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert len(srows) == 32000  # 500 vectors x 64 dims


class TestNpzShardCorpus:
    """npz embedding-shard layout (round 14): np.savez's container
    through the Spark corpus path."""

    def _write(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import write_npz_corpus
        from pipeline_mf_etl_spark.sources.readers import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = str(tmp_path / "npzcorpus")
        index = write_npz_corpus(emb, out, n_shards=3)
        return emb, out, index

    def test_row_lookups_round_trip_every_vector(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_npz_rows

        emb, out, index = self._write(spark, tmp_path)
        got = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in read_npz_rows(index, out).collect()
        )
        src = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in emb.collect()
        )
        assert got == src and len(got) == 500

    def test_full_scan_matches_source(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_npz_corpus

        emb, out, index = self._write(spark, tmp_path)
        got = sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in read_npz_corpus(spark, out).collect()
        )
        assert got == sorted(
            (r["vec_id"], tuple(r["embedding"]), r["label"])
            for r in emb.collect()
        )

    def test_shards_are_real_npz_files(self, spark, tmp_path):
        """np.load (the oracle) must read every shard we publish."""
        import glob as _glob
        import io

        import numpy as np

        emb, out, index = self._write(spark, tmp_path)
        total = 0
        for p in sorted(_glob.glob(f"{out}/shard-*.npz")):
            with open(p, "rb") as fh:
                loaded = np.load(io.BytesIO(fh.read()))
            assert sorted(loaded.files) == ["embedding", "label", "vec_id"]
            assert loaded["embedding"].dtype == np.float32
            total += loaded["embedding"].shape[0]
        assert total == 500


def test_c16_npz_lookup_matches_identity_oracle(spark, duck):
    """The registered npz round-trip (r15 exposure queue): write the
    embeddings table as npz shards + row index, look up every row via
    member offset arithmetic, posexplode, and the result must equal the
    source float-by-float."""
    import math

    from pipeline_mf_etl_spark.queries import all_queries

    spec = all_queries()["c16_npz_lookup"]
    sdf = spec.spark(spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def norm(v):
            if v is None:
                return "NULL"
            if isinstance(v, float):
                return "nan" if math.isnan(v) else f"{round(v, 9):.9f}"
            return str(v)

        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert len(srows) == 32000


class TestOrderedArrowExport:
    """The Arrow twin of TestOrderedTrainingExport: o15's assignment
    shipped as Feather-V2 shards whose record batches replay in pos
    order, point lookups through the footer index."""

    def _export(self, spark, tmp_path):
        from pipeline_mf_etl_spark.queries import all_queries
        from pipeline_mf_etl_spark.queries.corpus import _O15_SHARDS
        from pipeline_mf_etl_spark.sources.corpus_io import (
            export_ordered_arrow,
        )
        from pipeline_mf_etl_spark.sources.readers import load_table

        sf = "/root/testdata/sf0.001"
        docs = load_table(spark, sf, "documents")
        order = all_queries()["o15_shard_shuffle"].spark(spark, sf)
        out = str(tmp_path / "arrow_training_shards")
        index = export_ordered_arrow(
            docs, order, out, n_shards=_O15_SHARDS, batch_rows=8
        )
        return docs, order, out, index

    def test_batches_replay_in_pos_order(self, spark, tmp_path):
        import glob as _glob
        import os

        from pipeline_mf_etl_spark.sources.arrowipc import decode_arrow_file

        docs, order, out, index = self._export(spark, tmp_path)
        assign = {
            r["doc_id"]: (r["shard"], r["pos"]) for r in order.collect()
        }
        shards = sorted(_glob.glob(os.path.join(out, "shard-*.arrow")))
        assert len(shards) == len({s for s, _ in assign.values()})
        seen = 0
        for path in shards:
            s = int(os.path.basename(path).split("-")[1].split(".")[0])
            with open(path, "rb") as fh:
                got = decode_arrow_file(fh.read())
            doc_ids = got["columns"][0]
            want = [
                d
                for d, (sh, _) in sorted(
                    assign.items(), key=lambda kv: kv[1][1]
                )
                if sh == s
            ]
            assert doc_ids == want, path
            seen += len(doc_ids)
        assert seen == len(assign)

    def test_point_lookups_round_trip_every_doc(self, spark, tmp_path):
        from pipeline_mf_etl_spark.sources.corpus_io import read_arrow_docs

        docs, order, out, index = self._export(spark, tmp_path)
        assert index.count() == docs.count()
        fetched = read_arrow_docs(index, out)
        assert sorted(tuple(r) for r in fetched.collect()) == sorted(
            tuple(r) for r in docs.collect()
        )
