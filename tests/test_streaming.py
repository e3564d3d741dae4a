"""Stream-vs-batch equivalence: the shared transforms must produce the
same result through readStream (availableNow, memory sink) as through
the batch loader — the batch result is the semantic oracle for the
streaming path (SURVEY.md §2.11)."""

from __future__ import annotations

import uuid

import pytest

from pipeline_mf_etl_spark.sources.readers import load_table
from pipeline_mf_etl_spark.streaming import (
    daily_rollup,
    read_events_stream,
    session_rollup,
    sliding_rollup,
)
from tests.conftest import SF_SMOKE


def _run_stream(spark, transform):
    stream = read_events_stream(spark, SF_SMOKE)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("transform", [daily_rollup, sliding_rollup, session_rollup])
def test_stream_matches_batch(spark, transform):
    streamed = sorted(map(tuple, _run_stream(spark, transform).collect()))
    batch = sorted(
        map(tuple, transform(load_table(spark, SF_SMOKE, "events")).collect())
    )
    assert streamed == batch
    assert len(batch) > 0


def test_stateful_running_stats_matches_batch(spark):
    """applyInPandasWithState running totals: the LAST update emitted per
    user must equal the batch groupBy aggregate."""
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.streaming.stateful import running_user_stats

    stream = read_events_stream(spark, SF_SMOKE)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (user, micro-batch); with a single
    # events file there is one batch, so rows are already final totals
    streamed = {
        r["user_id"]: (r["n_events"], r["sum_value"], round(r["max_value"], 6))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 6), round(r["m"], 6))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
        .collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_bronze_ingest_matches_batch_and_is_incremental(spark, tmp_path):
    """Streamed bronze must equal the batch bronze layer row-for-row, and
    a second run with the same checkpoint must ingest NOTHING new —
    checkpoint file-tracking is the manifest-ledger replacement."""
    from pipeline_mf_etl_spark.pipeline import bronze_layer
    from pipeline_mf_etl_spark.sources.readers import load_table
    from pipeline_mf_etl_spark.streaming.transforms import stream_bronze_ingest

    sf = "/root/testdata/sf0.001"
    out, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")

    stream_bronze_ingest(spark, sf, out, ckpt)
    streamed = spark.read.parquet(out)
    batch = bronze_layer(load_table(spark, sf, "events"))
    assert streamed.count() == batch.count()
    cols = sorted(batch.columns)
    s_rows = sorted(map(tuple, streamed.select(*cols).collect()))
    b_rows = sorted(map(tuple, batch.select(*cols).collect()))
    assert s_rows == b_rows

    # idempotent re-run: checkpoint remembers the processed file
    stream_bronze_ingest(spark, sf, out, ckpt)
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_dedupe_matches_batch_keys(spark):
    """dropDuplicatesWithinWatermark must keep exactly one row per
    (user_id, ts) key — same key set and count as the deterministic
    batch keep-first dedupe (surviving-row identity is arrival order,
    so only keys/counts are compared)."""
    from pipeline_mf_etl_spark.streaming import (
        dedupe_events_batch,
        dedupe_events_stream,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        dedupe_events_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql(f"SELECT user_id, ts FROM {name}").collect()
    s_keys = sorted((r["user_id"], r["ts"]) for r in streamed)

    batch = dedupe_events_batch(load_table(spark, SF_SMOKE, "events"))
    b_keys = sorted(
        (r["user_id"], r["ts"]) for r in batch.select("user_id", "ts").collect()
    )
    assert len(s_keys) == len(set(s_keys)), "stream emitted a duplicate key"
    assert s_keys == b_keys and len(b_keys) > 0
