"""JSONL corpus source/sink — the LLM-training-data interchange format.

Large public corpora (C4, Dolma, RedPajama, FineWeb) ship as
newline-delimited JSON, usually gzip-compressed, one document object per
line. This module is the engine's boundary for that format:

- **Writes** are Spark-native ``df.write.json`` — one file per
  partition, splittable re-read when uncompressed, atomic via the
  standard ``_temporary`` commit protocol.
- **Reads take an EXPLICIT schema.** Schema inference on JSON is a full
  extra pass over the data — at 100 TB that is a second 100 TB scan
  before the first real one, so ``read_jsonl_corpus`` defaults to the
  documents-table contract and never infers unless the caller passes
  ``schema=None`` explicitly at their own (small-data) risk.
- **Malformed lines go to a rejects side-channel**, mirroring the S2
  delimited-text pattern (``ingest.read_txt_with_rejects``): PERMISSIVE
  mode + ``columnNameOfCorruptRecord`` keeps the raw bytes of every bad
  line instead of silently dropping (FAILFAST would kill a 100 TB job on
  one bad shard; DROPMALFORMED would hide curation-accounting rows).

Reference parity: the reference ingests delimited text only
(ingest/read_txt.py); JSONL is an engine ADDITION for the corpus
pipeline surface (documents table in/out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: The documents-table contract (TESTDATA.md): explicit so a 100 TB read
#: never pays an inference pass and type drift fails loudly at analysis
#: time instead of producing nullable-string soup.
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"

# The most recent cached parse handed out by read_jsonl_corpus. The two
# return legs share one cached frame (the SPARK-21610 corrupt-column
# split requires it), but the caller gets DataFrames, not the cache
# handle — so each new invocation evicts the previous entry, bounding
# pinned executor memory to ONE corpus parse per session instead of one
# per read (same pattern as queries/dedup._LAZY_SHINGLE_CACHE).
_LAZY_PARSE_CACHE: list[DataFrame] = []


def write_jsonl_corpus(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """Write a corpus as JSONL (one JSON object per line, one file per
    partition). ``compression=None`` keeps the output splittable — the
    right choice when the same cluster re-reads it; gzip (default)
    matches how public corpora are distributed."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | None = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with an explicit schema and a rejects
    side-channel. Returns ``(valid, rejects)``; rejects carry the raw
    line bytes and a reason, exactly like the S2 delimited reader, so
    curation accounting can attribute every dropped document.

    A line parses as a reject when it is not valid JSON **or** when a
    typed field conflicts with the schema (Spark nulls the row and files
    the raw text under ``_corrupt_record``). Lines that are valid JSON
    but MISS fields are valid rows with nulls — JSONL corpora are
    schema-sparse by convention and missing keys are data, not errors.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", _CORRUPT
    )
    if schema is not None:
        # the corrupt-record column must be part of the declared schema
        read_schema = StructType(
            list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
        )
        df = reader.schema(read_schema).json(path)
    else:  # small-data convenience: pay the inference pass knowingly
        df = reader.json(path)
        if _CORRUPT not in df.columns:  # corpus had no bad lines at all
            df = df.withColumn(_CORRUPT, F.lit(None).cast("string"))
    # Spark requires caching/materialization barriers around referencing
    # only the corrupt column (SPARK-21610: a plan selecting JUST
    # _corrupt_record is disallowed) — keeping both legs off one cached
    # frame also means the input is parsed once, not twice. Evict the
    # previous read's cache BEFORE persisting (cache-manager entries key
    # on the analyzed plan, so evicting after would drop a re-read of
    # the same path too).
    while _LAZY_PARSE_CACHE:
        _LAZY_PARSE_CACHE.pop().unpersist()
    df = df.cache()
    _LAZY_PARSE_CACHE.append(df)
    rejects = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line"),
        F.lit("BAD_JSON").alias("reason"),
    )
    valid = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return valid, rejects
