"""Statistical operator library (SURVEY.md §2.8).

Scalers are pure DataFrame algebra (grouped aggregates joined back —
no MLlib fit/transform object needed and the exact formulas stay
oracle-comparable). Bootstrap follows the reference's design point:
per-state values are capped and collected to the driver, where seeded
NumPy resampling runs exactly as in the reference
(validation/bootstrap.py:38-77) — the collected table is small by
construction (cap 50k points/state), so this is not a scale risk.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.functions.core import finite


def fit_global_scaler(df: DataFrame, col: str) -> DataFrame:
    """One-row params frame: mean/std_pop of the finite values (M1)."""
    v = finite(F.col(col))
    return df.agg(
        F.avg(v).alias("center__f"),
        F.coalesce(
            F.when(F.stddev_pop(v) > 0, F.stddev_pop(v)), F.lit(1.0)
        ).alias("spread__f"),
    )


def fit_robust_scaler_per_group(df: DataFrame, group: str, col: str) -> DataFrame:
    """Per-group median/IQR params; zero/degenerate spread → 1.0 (M2).

    Reference: research/preprocess.py:109-152 (per-ticker scaler params).
    """
    v = finite(F.col(col))
    q = lambda p: F.expr(f"percentile({col}, {p})")  # noqa: E731
    return df.groupBy(group).agg(
        q(0.5).alias("center__f"),
        F.coalesce(
            F.when((q(0.75) - q(0.25)) > 0, q(0.75) - q(0.25)), F.lit(1.0)
        ).alias("spread__f"),
    )


def bootstrap_ci(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    *,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
    ci: tuple[float, float] = (2.5, 97.5),
) -> DataFrame:
    """Seeded iid bootstrap CI of the mean/median per group (M13).

    Values are collected per group (deterministic order, capped) and
    resampled with a batched index matrix `rng.integers(0, n, (B, n))` —
    bit-reproducible under the fixed seed.
    """
    w_ordered = df.select(group, finite(F.col(col)).alias("v")).filter(
        F.col("v").isNotNull()
    )
    rows = (
        w_ordered.groupBy(group)
        .agg(F.sort_array(F.collect_list("v")).alias("vals"))
        .collect()
    )
    out = []
    for r in sorted(rows, key=lambda x: str(x[group])):
        vals = np.asarray(r["vals"][:cap], dtype=np.float64)
        n = len(vals)
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, n, size=(n_boot, n))
        means = vals[idx].mean(axis=1)
        medians = np.median(vals[idx], axis=1)
        lo, hi = ci
        out.append(
            (
                r[group],
                int(n),
                round(float(np.percentile(means, lo)), 6),
                round(float(np.percentile(means, hi)), 6),
                round(float(np.percentile(medians, lo)), 6),
                round(float(np.percentile(medians, hi)), 6),
            )
        )
    schema = f"{group} string, n long, mean_ci_lo double, mean_ci_hi double, median_ci_lo double, median_ci_hi double"
    return spark.createDataFrame(out, schema)


def block_bootstrap_ci(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    order: list[str],
    *,
    block_len: int = 10,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
    ci: tuple[float, float] = (2.5, 97.5),
) -> DataFrame:
    """Moving-block bootstrap CI of the mean per group (M14) — preserves
    short-range serial dependence by resampling contiguous blocks
    (reference validation/bootstrap.py:80-119). Values are collected in
    TIME order (not sorted) because block structure is the whole point.
    """
    rows = (
        df.select(group, *order, finite(F.col(col)).alias("v"))
        .filter(F.col("v").isNotNull())
        .orderBy(group, *order)
        .collect()
    )
    series: dict = {}
    for r in rows:
        series.setdefault(r[group], []).append(r["v"])
    out = []
    for key in sorted(series, key=str):
        vals = np.asarray(series[key][:cap], dtype=np.float64)
        n = len(vals)
        if n <= block_len:
            continue
        rng = np.random.default_rng(seed)
        n_blocks = int(np.ceil(n / block_len))
        starts = rng.integers(0, n - block_len + 1, size=(n_boot, n_blocks))
        # assemble each replicate from contiguous blocks, truncate to n
        offs = np.arange(block_len)
        idx = (starts[:, :, None] + offs[None, None, :]).reshape(n_boot, -1)[:, :n]
        means = vals[idx].mean(axis=1)
        lo, hi = ci
        out.append(
            (
                key,
                int(n),
                round(float(np.percentile(means, lo)), 6),
                round(float(np.percentile(means, hi)), 6),
            )
        )
    schema = f"{group} string, n long, mean_ci_lo double, mean_ci_hi double"
    return spark.createDataFrame(out, schema)


def pairwise_diff_ci(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    *,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
    ci: tuple[float, float] = (2.5, 97.5),
) -> DataFrame:
    """Pairwise state-difference bootstrap CIs (M15): difference of the
    per-state bootstrap mean distributions for every state pair, with
    the reference's sign-consistency flag lo>0 or hi<0
    (validation/bootstrap.py:314-340)."""
    rows = (
        df.select(group, finite(F.col(col)).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy(group)
        .agg(F.sort_array(F.collect_list("v")).alias("vals"))
        .collect()
    )
    dists = {}
    for r in sorted(rows, key=lambda x: str(x[group])):
        vals = np.asarray(r["vals"][:cap], dtype=np.float64)
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(vals), size=(n_boot, len(vals)))
        dists[r[group]] = vals[idx].mean(axis=1)
    keys = sorted(dists, key=str)
    lo_p, hi_p = ci
    out = []
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            diff = dists[a] - dists[b]
            lo = round(float(np.percentile(diff, lo_p)), 6)
            hi = round(float(np.percentile(diff, hi_p)), 6)
            out.append((a, b, lo, hi, bool(lo > 0 or hi < 0)))
    schema = "state_a string, state_b string, diff_ci_lo double, diff_ci_hi double, diff_sign_consistent boolean"
    return spark.createDataFrame(out, schema)
