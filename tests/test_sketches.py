"""Error-bound property tests for the sketch queries (rows-only by
design: sketch internals are engine-specific, so no DuckDB oracle —
instead the approximations are bounded against the exact answers)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pipeline_mf_etl_spark.queries import all_queries
from pipeline_mf_etl_spark.sources.readers import load_table
from tests.conftest import SF_ORACLE

_QUERIES = all_queries()


def test_approx_quantiles_within_accuracy(spark):
    """percentile_approx at accuracy 10k must land within 1% RANK error
    of the exact percentile: the approximate p50 must sit between the
    exact p49 and p51 of the same group."""
    approx = {
        r["event_type"]: r
        for r in _QUERIES["a16_approx_quantiles"].spark(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    bounds = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.49)").alias("lo50"),
            F.expr("percentile(value, 0.51)").alias("hi50"),
            F.expr("percentile(value, 0.94)").alias("lo95"),
            F.expr("percentile(value, 0.96)").alias("hi95"),
        )
        .collect()
    )
    for r in bounds:
        a = approx[r["event_type"]]
        assert r["lo50"] <= a["p50"] <= r["hi50"], (r, a)
        assert r["lo95"] <= a["p95"] <= r["hi95"], (r, a)


def test_heavy_hitters_bounds(spark):
    """Count-min estimates NEVER undercount, and at eps=0.001 the
    overestimate is bounded by ~0.1% of the stream length."""
    est = {
        r["user_id"]: r["est_count"]
        for r in _QUERIES["a17_heavy_hitters"].spark(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    n_total = ev.count()
    exact = {
        r["user_id"]: r["count"]
        for r in ev.groupBy("user_id").count().collect()
        if r["user_id"] in est
    }
    assert set(est) == set(exact) and len(est) == 10
    for uid, e in est.items():
        assert e >= exact[uid], f"CMS undercounted uid {uid}"
        assert e <= exact[uid] + max(3, 0.002 * n_total), f"overestimate too large for {uid}"


def test_approx_distinct_error_bound(spark):
    """HLL++ (rsd=2%) distinct estimates land within a generous 5x rsd
    band of the exact cardinalities, per event_type, on both probed
    dimensions (users, days)."""
    approx = {
        r["event_type"]: r
        for r in _QUERIES["a18_approx_distinct"].spark(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.countDistinct(F.to_date("ts")).alias("days"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et, a in approx.items():
        x = exact[et]
        assert abs(a["approx_users"] - x["users"]) <= max(2, 0.10 * x["users"]), (et, a, x)
        assert abs(a["approx_days"] - x["days"]) <= max(2, 0.10 * x["days"]), (et, a, x)
