"""Property tests for the oracle-less bootstrap operators (M13-M15).

These back the rows-only correctness check with statistical properties:
determinism under seed, CI coverage of the true mean, block structure,
and sign-consistency on well-separated groups.
"""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_mf_etl_spark.operators.stats import (
    block_bootstrap_ci,
    bootstrap_ci,
    pairwise_diff_ci,
)


def _mk_df(spark, groups):
    """groups: dict name -> 1-D numpy array; returns (g, ts, v) DataFrame."""
    rows = []
    for g, vals in groups.items():
        for i, v in enumerate(vals):
            rows.append((g, i, float(v)))
    return spark.createDataFrame(rows, "g string, ts long, v double")


def test_block_bootstrap_deterministic_and_brackets_mean(spark):
    rng = np.random.default_rng(7)
    # AR(1)-ish serially-dependent series around mean 5.0
    n = 800
    e = rng.normal(0, 1, n)
    x = np.empty(n)
    x[0] = 5.0
    for i in range(1, n):
        x[i] = 5.0 + 0.6 * (x[i - 1] - 5.0) + e[i]
    df = _mk_df(spark, {"a": x})

    r1 = block_bootstrap_ci(spark, df, "g", "v", ["ts"], seed=42).collect()
    r2 = block_bootstrap_ci(spark, df, "g", "v", ["ts"], seed=42).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]

    (row,) = r1
    assert row["n"] == n
    assert row["mean_ci_lo"] < x.mean() < row["mean_ci_hi"]
    # block bootstrap of dependent data should be wider than iid bootstrap
    iid = bootstrap_ci(spark, df, "g", "v").collect()[0]
    assert (row["mean_ci_hi"] - row["mean_ci_lo"]) > 0.8 * (
        iid["mean_ci_hi"] - iid["mean_ci_lo"]
    )


def test_block_bootstrap_skips_short_groups(spark):
    df = _mk_df(spark, {"tiny": np.arange(5), "big": np.random.default_rng(0).normal(0, 1, 100)})
    rows = block_bootstrap_ci(spark, df, "g", "v", ["ts"], block_len=10).collect()
    assert [r["g"] for r in rows] == ["big"]


def test_pairwise_diff_ci_sign_consistency(spark):
    rng = np.random.default_rng(3)
    df = _mk_df(
        spark,
        {
            "lo": rng.normal(0.0, 1.0, 400),
            "hi": rng.normal(10.0, 1.0, 400),
            "mid": rng.normal(0.0, 1.0, 400),
        },
    )
    rows = {(r["state_a"], r["state_b"]): r for r in pairwise_diff_ci(spark, df, "g", "v").collect()}
    # all unordered pairs, each once, lexicographic
    assert set(rows) == {("hi", "lo"), ("hi", "mid"), ("lo", "mid")}
    # hi clearly above both -> sign-consistent positive diff
    assert rows[("hi", "lo")]["diff_sign_consistent"]
    assert rows[("hi", "lo")]["diff_ci_lo"] > 0
    assert rows[("hi", "mid")]["diff_sign_consistent"]
    # lo vs mid overlap -> not sign-consistent
    assert not rows[("lo", "mid")]["diff_sign_consistent"]
    assert rows[("lo", "mid")]["diff_ci_lo"] < 0 < rows[("lo", "mid")]["diff_ci_hi"]


def test_pairwise_diff_ci_deterministic(spark):
    rng = np.random.default_rng(11)
    df = _mk_df(spark, {"a": rng.normal(0, 1, 200), "b": rng.normal(1, 1, 200)})
    r1 = pairwise_diff_ci(spark, df, "g", "v").collect()
    r2 = pairwise_diff_ci(spark, df, "g", "v").collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


def test_approx_count_distinct_accuracy(spark):
    """HLL approx_count_distinct — the 100 TB cardinality primitive —
    must land within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.sources.readers import load_table
    from tests.conftest import SF_ORACLE

    li = load_table(spark, SF_ORACLE, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05, row


def test_bootstrap_cap_applied_in_time_order(spark):
    """With n > cap, the cap must keep the FIRST cap rows in time order —
    capping the sorted values would resample only the smallest and bias
    the CI low. Series: first 100 points ~ 100.0, last 100 ~ 0.0; a
    time-order cap of 100 gives a CI near 100, a sorted cap near 0."""
    vals = np.concatenate([np.full(100, 100.0), np.zeros(100)])
    vals += np.arange(200) * 1e-6  # break ties deterministically
    df = _mk_df(spark, {"a": vals})
    r = bootstrap_ci(spark, df, "g", "v", order=["ts"], cap=100).collect()[0]
    assert r["n"] == 100
    assert r["mean_ci_lo"] > 99.0, r  # would be ~0 under a sorted cap

    # without order columns, an over-cap group must be rejected loudly
    with pytest.raises(ValueError, match="order"):
        bootstrap_ci(spark, df, "g", "v", cap=100).collect()


def test_robust_scaler_ignores_non_finite(spark):
    """NaN/inf inputs must not poison per-group median/IQR — Spark sorts
    NaN greatest, so raw percentiles would shift; the reference uses
    nanpercentile."""
    from pipeline_mf_etl_spark.operators.stats import fit_robust_scaler_per_group

    base = [float(x) for x in range(1, 101)]  # median 50.5, IQR 50
    clean = _mk_df(spark, {"a": np.array(base)})
    dirty_rows = [("a", i, v) for i, v in enumerate(base)] + [
        ("a", 200, float("nan")),
        ("a", 201, float("inf")),
        ("a", 202, float("-inf")),
    ]
    dirty = spark.createDataFrame(dirty_rows, "g string, ts long, v double")

    p_clean = fit_robust_scaler_per_group(clean, "g", "v").collect()[0]
    p_dirty = fit_robust_scaler_per_group(dirty, "g", "v").collect()[0]
    assert p_clean["center__f"] == p_dirty["center__f"]
    assert p_clean["spread__f"] == p_dirty["spread__f"]


def test_events_value_is_two_decimal_fixed_point(spark):
    """p4's exact integer-cents mean (and any future fixed-point mean)
    relies on events.value being a 2-dp price: every value*100 must be
    integral to double precision. If the testdata contract ever drifts,
    this fails before a rounding-tie mismatch can."""
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.sources.readers import load_table
    from tests.conftest import SF_ORACLE

    ev = load_table(spark, SF_ORACLE, "events")
    off = ev.filter(
        F.abs(F.col("value") * 100 - F.round(F.col("value") * 100)) > 1e-9
    ).count()
    assert off == 0
