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
