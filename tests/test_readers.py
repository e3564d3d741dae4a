"""readers.fan_out small-input guard: repartitions single-row-group
test tables, stays a NO-OP at production split counts, and decides
WITHOUT touching df.rdd (r10 verdict nit #2 — the RDD probe built a
Python RDD lineage + physical-plan materialization on every call)."""

from __future__ import annotations

from pipeline_mf_etl_spark.sources.readers import (
    _estimated_scan_splits,
    fan_out,
    load_table,
)

SF = "/root/testdata/sf0.001"


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    return plan.count("exchange roundrobinpartitioning")


def test_small_scan_fans_out(spark):
    docs = load_table(spark, SF, "documents")
    target = spark.sparkContext.defaultParallelism
    out = fan_out(docs)
    assert _n_exchanges(out) == 1
    assert out.rdd.getNumPartitions() == target


def test_sufficient_splits_is_identity(spark):
    """When the scan already has >= target splits the frame comes back
    UNTOUCHED — no exchange may enter a production plan."""
    docs = load_table(spark, SF, "documents")
    out = fan_out(docs, min_partitions=1)
    assert out is docs


def test_many_files_counted_without_rdd(spark, tmp_path):
    """A multi-file source clears the parallelism target on file count
    alone: the estimator must see >= 8 splits for an 8-file dataset and
    fan_out must leave the plan alone."""
    p = str(tmp_path / "many")
    spark.range(0, 80).repartition(8).write.parquet(p)
    df = spark.read.parquet(p)
    assert _estimated_scan_splits(df) >= 8
    out = fan_out(df, min_partitions=8)
    assert out is df


def test_estimator_counts_byte_splits_for_large_files(spark, tmp_path):
    """A single LARGE local file must not be mistaken for a small input:
    with maxPartitionBytes shrunk below the file size, the estimator
    counts its byte-range splits."""
    p = str(tmp_path / "one")
    spark.range(0, 200_000).coalesce(1).write.parquet(p)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try:
        df = spark.read.parquet(p)
        assert _estimated_scan_splits(df) > 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_in_memory_frame_falls_back(spark):
    """Frames with no file index (createDataFrame) still get a correct
    decision via the physical-probe fallback."""
    df = spark.createDataFrame([(1,), (2,)], "a int")
    out = fan_out(df, min_partitions=1)
    assert out.count() == 2
