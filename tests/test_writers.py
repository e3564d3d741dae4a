"""Partitioned sink round-trip + partition pruning + atomic JSON
artifact (SURVEY.md §2.1 S5/S6/S8)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pipeline_mf_etl_spark.sources.readers import load_table
from pipeline_mf_etl_spark.sources.writers import (
    read_partition,
    write_json_artifact,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_day", F.col("ts").cast("date").cast("string")
    )
    out = str(tmp_path / "events_parted")
    write_partitioned(ev, out, ["event_type"])
    # hive layout on disk
    assert any(d.startswith("event_type=") for d in os.listdir(out))

    back = read_partition(spark, out, event_type="error")
    expected = ev.filter("event_type = 'error'").count()
    assert back.count() == expected > 0
    # partition pruning visible in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]


def test_json_artifact_atomic(tmp_path):
    p = str(tmp_path / "artifacts" / "run_summary.json")
    write_json_artifact({"rows": 42, "status": "OK"}, p)
    with open(p) as fh:
        assert json.load(fh) == {"rows": 42, "status": "OK"}
    # no temp leftovers
    assert [f for f in os.listdir(os.path.dirname(p))] == ["run_summary.json"]


def test_compact_parquet_dir_reduces_files_and_preserves_data(spark, tmp_path):
    """Compaction must collapse a many-small-files table to the computed
    file count, keep every row bit-identical, and (with sort_cols) give
    each output file a tight, non-overlapping sort-key range — the
    row-group-skipping payoff that motivates compacting at all."""
    from pipeline_mf_etl_spark.sources.writers import compact_parquet_dir

    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(10_000).selectExpr("id", "id % 97 AS k", "id * 2 AS v")
    df.repartition(64).write.parquet(src)  # the small-files mess

    stats = compact_parquet_dir(spark, src, dst, target_mb=512, sort_cols=["id"])
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1  # tiny table → one target file
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0

    # multi-file path: force several range files, ranges must not overlap
    import glob as _g

    dst2 = str(tmp_path / "compact2")
    # high-entropy payload so the parquet bytes exceed one 1 MB target
    big = spark.range(200_000).selectExpr(
        "id", "id % 7 AS k", "md5(CAST(id AS STRING)) AS pad"
    )
    big.repartition(32).write.parquet(str(tmp_path / "small2"))
    compact_parquet_dir(spark, str(tmp_path / "small2"), dst2, target_mb=1,
                        sort_cols=["id"])
    spans = []
    for f in _g.glob(dst2 + "/*.parquet"):
        part = spark.read.parquet(f).agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).collect()[0]
        spans.append((part["lo"], part["hi"]))
    spans.sort()
    assert len(spans) > 1
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, (lo1, hi1, lo2)  # non-overlapping key ranges
