"""Statistical operator library (SURVEY.md §2.8).

Scalers are pure DataFrame algebra (grouped aggregates joined back —
no MLlib fit/transform object needed and the exact formulas stay
oracle-comparable). Bootstrap follows the reference's design point:
per-state values are capped IN TIME ORDER distributed-side (row_number
over the order columns, before any collect), then brought to the driver
where seeded NumPy resampling runs exactly as in the reference
(validation/bootstrap.py:38-77) — the driver transfer is bounded at
cap (50k) points/state at any input size, so this is not a scale risk.
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

    Percentiles run over FINITE values only (NaN/inf projected to NULL
    first, which percentile ignores) — Spark sorts NaN greatest, so raw
    percentiles would poison center/spread; the reference uses
    nanpercentile (research/preprocess.py:109-152).
    """
    proj = df.select(group, finite(F.col(col)).alias("__fin"))
    q = lambda p: F.expr(f"percentile(__fin, {p})")  # noqa: E731
    return proj.groupBy(group).agg(
        q(0.5).alias("center__f"),
        F.coalesce(
            F.when((q(0.75) - q(0.25)) > 0, q(0.75) - q(0.25)), F.lit(1.0)
        ).alias("spread__f"),
    )


def _capped_value_lists(
    df: DataFrame,
    group: str,
    col: str,
    order: list[str] | None,
    cap: int,
) -> list:
    """Per-group finite values, capped to the FIRST ``cap`` rows in
    ``order`` (time order, mirroring the reference's cap) BEFORE any
    value sorting — capping the smallest 50k values would bias every CI
    low. The post-cap sort_array only makes the collected order
    deterministic for seeded resampling. The row_number cap also bounds
    the collect_list itself, keeping the driver transfer <= cap rows per
    group at any input size."""
    sel = df.select(group, *(order or []), finite(F.col(col)).alias("v")).filter(
        F.col("v").isNotNull()
    )
    if order:
        from pyspark.sql import Window

        w = Window.partitionBy(group).orderBy(*[F.col(c) for c in order])
        sel = sel.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= cap
        )
        rows = (
            sel.groupBy(group)
            .agg(F.sort_array(F.collect_list("v")).alias("vals"))
            .collect()
        )
    else:
        # guard BEFORE any collect: without order columns there is no
        # defensible cap order, so an over-cap group must fail loudly
        # distributed-side — checking after collect_list would ship the
        # unbounded lists to the driver first (the OOM the cap prevents).
        # sel is cached so the guard + collect share one source scan;
        # the aggregate is aliased so a group column literally named
        # "count" cannot collide with it.
        sel = sel.cache()
        try:
            over = (
                sel.groupBy(group)
                .agg(F.count("*").alias("__cnt"))
                .filter(F.col("__cnt") > cap)
                .limit(1)
                .collect()
            )
            if over:
                raise ValueError(
                    f"group {over[0][group]!r} exceeds cap={cap}; pass `order` "
                    "columns so the cap is applied in time order"
                )
            rows = (
                sel.groupBy(group)
                .agg(F.sort_array(F.collect_list("v")).alias("vals"))
                .collect()
            )
        finally:
            sel.unpersist()
    return rows


def bootstrap_distributions(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    *,
    order: list[str] | None = None,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
) -> DataFrame:
    """Per-replicate iid bootstrap statistic distributions (M13 phase 1).

    Values are capped to the first ``cap`` rows in ``order`` (time
    order, as the reference caps on (ticker, trade_date)), then
    resampled with a batched index matrix `rng.integers(0, n, (B, n))` —
    bit-reproducible under the fixed seed. Returns one row per
    (group, replicate): ``(group, n, boot_idx, mean_rep, median_rep)``
    — the persistable intermediate everything downstream (CIs, pairwise
    diffs) derives from with plain aggregates.
    """
    rows = _capped_value_lists(df, group, col, order, cap)
    out = []
    for r in sorted(rows, key=lambda x: str(x[group])):
        vals = np.asarray(r["vals"], dtype=np.float64)
        n = len(vals)
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, n, size=(n_boot, n))
        means = vals[idx].mean(axis=1)
        medians = np.median(vals[idx], axis=1)
        for b in range(n_boot):
            out.append((r[group], int(n), b, float(means[b]), float(medians[b])))
    schema = (
        f"{group} string, n long, boot_idx int, mean_rep double, median_rep double"
    )
    return spark.createDataFrame(out, schema)


def ci_from_distributions(
    dists: DataFrame,
    group: str,
    ci: tuple[float, float] = (2.5, 97.5),
    with_median: bool = True,
) -> DataFrame:
    """Percentile CIs over a per-replicate distribution frame (M13/M14
    phase 2) — exact continuous-interpolation percentiles so a DuckDB
    ``quantile_cont`` oracle over the same persisted rows agrees. The
    single aggregate shared by the iid (mean+median) and block (mean
    only) paths, mirroring the oracle builder's ``with_median`` flag."""
    lo, hi = ci[0] / 100.0, ci[1] / 100.0
    aggs = [
        F.max("n").alias("n"),
        F.round(F.expr(f"percentile(mean_rep, {lo})"), 6).alias("mean_ci_lo"),
        F.round(F.expr(f"percentile(mean_rep, {hi})"), 6).alias("mean_ci_hi"),
    ]
    if with_median:
        aggs += [
            F.round(F.expr(f"percentile(median_rep, {lo})"), 6).alias("median_ci_lo"),
            F.round(F.expr(f"percentile(median_rep, {hi})"), 6).alias("median_ci_hi"),
        ]
    return dists.groupBy(group).agg(*aggs)


def bootstrap_ci(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    *,
    order: list[str] | None = None,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
    ci: tuple[float, float] = (2.5, 97.5),
) -> DataFrame:
    """Seeded iid bootstrap CI of the mean/median per group (M13) —
    distribution phase + percentile phase composed."""
    dists = bootstrap_distributions(
        spark, df, group, col, order=order, n_boot=n_boot, cap=cap, seed=seed
    )
    return ci_from_distributions(dists, group, ci)


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
    TIME order (not sorted) because block structure is the whole point;
    the cap is applied distributed (row_number <= cap per group) BEFORE
    the collect so the driver transfer is bounded at any input size.
    """
    dists = block_bootstrap_distributions(
        spark,
        df,
        group,
        col,
        order,
        block_len=block_len,
        n_boot=n_boot,
        cap=cap,
        seed=seed,
    )
    return ci_from_distributions(dists, group, ci, with_median=False)


def block_bootstrap_distributions(
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
) -> DataFrame:
    """Moving-block replicate mean distributions (M14 phase 1). Values
    are collected in TIME order (not sorted) because block structure is
    the whole point; the cap is applied distributed (row_number <= cap
    per group) BEFORE the collect so the driver transfer is bounded at
    any input size. Groups with n <= block_len are skipped (too short
    to block-resample), as in the reference."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(*[F.col(c) for c in order])
    rows = (
        df.select(group, *order, finite(F.col(col)).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .orderBy(group, *order)
        .collect()
    )
    series: dict = {}
    for r in rows:
        series.setdefault(r[group], []).append(r["v"])
    out = []
    for key in sorted(series, key=str):
        vals = np.asarray(series[key], dtype=np.float64)
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
        for b in range(n_boot):
            out.append((key, int(n), b, float(means[b])))
    schema = f"{group} string, n long, boot_idx int, mean_rep double"
    return spark.createDataFrame(out, schema)


def pairwise_diff_ci(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    *,
    order: list[str] | None = None,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
    ci: tuple[float, float] = (2.5, 97.5),
) -> DataFrame:
    """Pairwise state-difference bootstrap CIs (M15): difference of the
    per-state bootstrap mean distributions for every state pair, with
    the reference's sign-consistency flag lo>0 or hi<0
    (validation/bootstrap.py:314-340)."""
    dists = pairwise_diff_distributions(
        spark, df, group, col, order=order, n_boot=n_boot, cap=cap, seed=seed
    )
    return pairwise_ci_from_distributions(dists, ci)


def pairwise_diff_distributions(
    spark: SparkSession,
    df: DataFrame,
    group: str,
    col: str,
    *,
    order: list[str] | None = None,
    n_boot: int = 200,
    cap: int = 50_000,
    seed: int = 42,
) -> DataFrame:
    """Per-replicate mean DIFFERENCE distributions for every state pair
    (M15 phase 1): ``(state_a, state_b, boot_idx, diff_rep)``."""
    rows = _capped_value_lists(df, group, col, order, cap)
    dists = {}
    for r in sorted(rows, key=lambda x: str(x[group])):
        vals = np.asarray(r["vals"], dtype=np.float64)
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(vals), size=(n_boot, len(vals)))
        dists[r[group]] = vals[idx].mean(axis=1)
    keys = sorted(dists, key=str)
    out = []
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            diff = dists[a] - dists[b]
            for k in range(n_boot):
                out.append((a, b, k, float(diff[k])))
    schema = "state_a string, state_b string, boot_idx int, diff_rep double"
    return spark.createDataFrame(out, schema)


def pairwise_ci_from_distributions(
    dists: DataFrame,
    ci: tuple[float, float] = (2.5, 97.5),
) -> DataFrame:
    """Percentile CIs + sign-consistency flag over persisted pairwise
    diff distributions (M15 phase 2). The flag is computed from the
    ROUNDED bounds on both engines so the hash cannot flip on a
    boundary ulp."""
    lo, hi = ci[0] / 100.0, ci[1] / 100.0
    agg = dists.groupBy("state_a", "state_b").agg(
        F.round(F.expr(f"percentile(diff_rep, {lo})"), 6).alias("diff_ci_lo"),
        F.round(F.expr(f"percentile(diff_rep, {hi})"), 6).alias("diff_ci_hi"),
    )
    return agg.withColumn(
        "diff_sign_consistent",
        (F.col("diff_ci_lo") > 0) | (F.col("diff_ci_hi") < 0),
    )
