"""Multimodal-column queries: binary payload metadata, byte-level
feature extraction, frame-sampling fan-out (training-data-pipeline
first-class operators; see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.multimodal import (
    extract_byte_features,
    sample_frames,
    with_binary_payload,
)
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# mm1: binary payload + typed metadata, JVM-side byte ops only
# ---------------------------------------------------------------------------
@query(
    "mm1_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           hex(encode(substring(text, 1, 4))) AS header_hex,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm1_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction: byte length, 4-byte header hex,
    payload md5 — all whole-stage-codegen expressions, no Python."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.hex(F.encode(F.substring("text", 1, 4), "UTF-8")).alias("header_hex"),
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# mm2: Arrow-batched byte featurizer (mapInPandas) — the codec stand-in.
# The oracle iterates CHARACTERS and uses ord() as the byte value, valid
# because the documents corpus is pure ASCII (verified; DuckDB cannot
# unnest BLOB bytes directly). sha256(VARCHAR) hashes the UTF-8 bytes on
# both engines; mean/hist divisions are exact-int / exact-int in float64
# so the two sides agree bitwise before the shared 6-dp rounding.
# ---------------------------------------------------------------------------
@query(
    "mm2_byte_features",
    oracle="""
    WITH chars AS (
        -- length guard: split('', '') yields [''] whose ord() is -1, so
        -- empty docs must come from the LEFT JOIN below, not from here
        SELECT doc_id, ord(unnest(split(text, ''))) AS byte
        FROM documents WHERE length(text) > 0
    ), agg AS (
        SELECT doc_id,
               COUNT(*) AS n_bytes,
               SUM(byte) * 1.0 / COUNT(*) AS byte_mean,
               SUM(CASE WHEN byte // 16 = 6 THEN 1.0 ELSE 0.0 END) / COUNT(*)
                   AS hist_bin_6
        FROM chars GROUP BY doc_id
    )
    -- LEFT JOIN + COALESCE: a zero-length doc has no unnested chars, so
    -- the inner-join form would DROP it while the Spark side emits it
    -- with n_bytes=0, null mean, 0.0 histogram (operators/multimodal.py).
    SELECT d.doc_id,
           COALESCE(a.n_bytes, 0) AS n_bytes,
           ROUND(a.byte_mean, 6) AS byte_mean,
           sha256(d.text) AS payload_sha256,
           ROUND(COALESCE(a.hist_bin_6, 0.0), 6) AS hist_bin_6
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def mm2_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin byte histogram + mean byte + SHA-256 per payload via
    mapInPandas (the real featurizer plumbing; decode stays gated)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    feats = extract_byte_features(docs)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.col("byte_mean"), 6).alias("byte_mean"),
        "payload_sha256",
        F.round(F.element_at("byte_hist", 7), 6).alias("hist_bin_6"),
    )


# ---------------------------------------------------------------------------
# mm3: frame-sampling fan-out (explode-shaped, shuffle-free)
# ---------------------------------------------------------------------------
@query(
    "mm3_frame_sample",
    oracle="""
    WITH meta AS (
        SELECT doc_id, octet_length(encode(text)) // 16 AS n_frames
        FROM documents
    )
    SELECT m.doc_id, t.frame_idx,
           md5(CAST(m.doc_id AS VARCHAR) || ':' || CAST(t.frame_idx AS VARCHAR))
               AS frame_key
    FROM meta m, UNNEST(range(0, m.n_frames, 4)) AS t(frame_idx)
    WHERE m.n_frames > 0
    """,
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 'frame' of each payload with a deterministic frame key —
    the video-sampling fan-out plan (explode, no shuffle)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs, stride=4)
