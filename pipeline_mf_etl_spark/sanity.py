"""Per-layer QA sanity runners (reference ``*-sanity`` CLI family).

The reference ships ~14 ``*-sanity`` commands (``cli.py:413`` bronze,
``:923`` silver, ``:1074`` gold, ``:1233`` backtest, …), each of which
re-aggregates a layer into a QA summary contract: one
``<layer>_sanity_summary.json`` (generated_ts + scalar counts + top-K
lists) plus small rollup tables written as parquet + CSV twins
(``bronze/sanity_checks.py:158-302``). The summaries here are computed
from the engine's already-certified aggregates — each scalar in the
JSON is a one-row collect of a green query's frame, so the sanity
surface inherits the correctness gate.

Layers:

* ``bronze``   — series/master QA over ``events`` (ticker counts, date
  bounds, warn/error totals, duplicate rows, rows-by-year rollup,
  per-series report; reference bronze sanity).
* ``research`` — cluster/HMM QA (cluster profile, quality metrics,
  dwell stats; reference research/hmm sanity).
* ``backtest`` — trade QA (per-side metrics, equity tail, robustness;
  reference backtest/sensitivity sanity).
* ``corpus``   — documents QA (language mix, quality score, dup rate;
  engine addition for the LLM-pipeline family).
* ``silver``   — normalized base-series QA (row/ticker counts, key
  derived-feature null rates; reference ``silver-sanity``,
  ``silver/pipeline.py:407-470``).
* ``indicators`` — TMF/TTI indicator QA (null counts, zero-cross
  totals, top |tmf| by symbol; reference ``indicators-sanity``,
  ``silver/indicators_pipeline.py:454-540``).
* ``events``   — event-grammar QA (flag totals, state-label counts,
  top symbols by activity; reference ``events-sanity``,
  ``gold/pipeline.py:431-520``).
* ``features`` — feature-frame QA (key-feature null rates, top
  symbols by avg activity; reference ``features-sanity``,
  ``gold/features_pipeline.py:452-540``).
* ``validation`` — validation-harness QA (top states by forward
  return, pairwise sign-consistent share, transition/stability
  highlights; reference ``validation/sanity.py:30-88``).
* ``grid``     — sensitivity-grid QA (combo uniqueness, non-finite
  metric cells, invalid robustness for traded combos; reference
  ``backtest/sensitivity_sanity.py:41-120``).

Everything driver-side here is a bounded scalar/top-K collect of an
already-aggregated tiny frame — no per-row driver loops. Where the
reference scans one parquet file per symbol in a Python loop, the
same totals here are ONE distributed aggregation over the layer frame
(the per-file loop would serialize a 1000-executor cluster).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.sources.writers import write_csv_twin, write_json_artifact

LAYERS = (
    "bronze",
    "silver",
    "indicators",
    "events",
    "features",
    "research",
    "backtest",
    "validation",
    "grid",
    "corpus",
)


def _rows(df: DataFrame, limit: int | None = None) -> list[dict]:
    it = df.limit(limit).collect() if limit else df.collect()

    def _j(v):  # JSON-safe: dates/timestamps/decimals -> ISO strings
        return v if v is None or isinstance(v, (bool, int, float, str)) else str(v)

    return [{k: _j(v) for k, v in r.asDict(recursive=True).items()} for r in it]


def _write_rollup(df: DataFrame, output: str, layer: str, name: str) -> None:
    base = f"{output}/{layer}_qa/{name}"
    df.write.mode("overwrite").parquet(base)
    write_csv_twin(df, base + "_csv")


def _bronze(spark: SparkSession, sf_dir: str, output: str) -> dict:
    from pipeline_mf_etl_spark.queries.quality import p4_quality_report
    from pipeline_mf_etl_spark.queries.relational import a6_rows_by_year
    from pipeline_mf_etl_spark.queries.windows import w15_duplicate_flag

    per_series = p4_quality_report(spark, sf_dir).cache()
    totals = per_series.agg(
        F.count("*").alias("ticker_count"),
        F.sum("n_rows").alias("total_rows"),
        F.sum("n_errors").alias("total_error_rows"),
        F.min("first_day").alias("global_min_day"),
        F.max("last_day").alias("global_max_day"),
    ).collect()[0]
    dup_rows = (
        w15_duplicate_flag(spark, sf_dir)
        .agg(F.sum(F.col("n_in_dup_days").cast("long")).alias("d"))
        .collect()[0]["d"]
    )
    rows_by_year = a6_rows_by_year(spark, sf_dir)
    top_error = per_series.orderBy(F.desc("n_errors"), F.desc("n_rows"))
    top_rows = per_series.orderBy(F.desc("n_rows"))
    summary = {
        "layer": "bronze",
        "ticker_count": int(totals["ticker_count"]),
        "total_rows": int(totals["total_rows"]),
        "total_error_rows": int(totals["total_error_rows"]),
        "rows_in_duplicated_days": int(dup_rows or 0),
        "global_min_day": totals["global_min_day"],
        "global_max_day": totals["global_max_day"],
        "top_series_by_errors": _rows(top_error, 20),
        "top_series_by_row_count": _rows(top_rows, 20),
        "rows_by_year": _rows(rows_by_year),
    }
    _write_rollup(per_series, output, "bronze", "per_series_report")
    _write_rollup(rows_by_year, output, "bronze", "rows_by_year")
    per_series.unpersist()
    return summary


def _research(spark: SparkSession, sf_dir: str, output: str) -> dict:
    from pipeline_mf_etl_spark.queries.ml import m4_kmeans_profile, m7_cluster_quality
    from pipeline_mf_etl_spark.queries.stats import m12_dwell_stats

    profile = m4_kmeans_profile(spark, sf_dir).cache()
    quality = m7_cluster_quality(spark, sf_dir).collect()[0]
    dwell = m12_dwell_stats(spark, sf_dir)
    sizes = [int(r["cluster_size"]) for r in profile.collect()]
    summary = {
        "layer": "research",
        "k": int(quality["k"]),
        "silhouette_simplified": float(quality["silhouette_simplified"]),
        "within_sse": float(quality["within_sse"]),
        "cluster_sizes": sizes,
        "smallest_cluster_share": (min(sizes) / sum(sizes)) if sizes else None,
        "cluster_profile": _rows(profile),
        "dwell_stats": _rows(dwell),
    }
    _write_rollup(profile, output, "research", "cluster_profile")
    _write_rollup(dwell, output, "research", "dwell_stats")
    profile.unpersist()
    return summary


def _backtest(spark: SparkSession, sf_dir: str, output: str) -> dict:
    from pipeline_mf_etl_spark.queries.backtest import (
        b7_trade_metrics,
        b8_equity_curve,
        b11_robustness_score,
    )

    metrics = b7_trade_metrics(spark, sf_dir).cache()
    n_trades = metrics.agg(F.sum("n_trades")).collect()[0][0]
    equity_tail = b8_equity_curve(spark, sf_dir).orderBy(F.desc("exit_day")).limit(1)
    robustness = b11_robustness_score(spark, sf_dir)
    summary = {
        "layer": "backtest",
        "n_trades": int(n_trades or 0),
        "per_side_metrics": _rows(metrics),
        "final_equity": _rows(equity_tail),
        "robustness": _rows(robustness, 20),
    }
    _write_rollup(metrics, output, "backtest", "trade_metrics")
    _write_rollup(robustness, output, "backtest", "robustness")
    metrics.unpersist()
    return summary


def _corpus(spark: SparkSession, sf_dir: str, output: str) -> dict:
    from pipeline_mf_etl_spark.queries.dedup import d1_exact_dedupe
    from pipeline_mf_etl_spark.queries.text import t1_lang_id, t2_quality_score

    lang = (
        t1_lang_id(spark, sf_dir)
        .groupBy("pred_lang")
        .agg(F.sum("n").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "pred_lang")
        .cache()
    )
    quality = t2_quality_score(spark, sf_dir).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(F.min("quality"), 6).alias("min_quality"),
        F.round(F.max("quality"), 6).alias("max_quality"),
    ).collect()[0]
    dup_groups = d1_exact_dedupe(spark, sf_dir).agg(
        F.count("*").alias("n_dup_groups"),
        F.sum("n_docs").alias("n_dup_docs"),
    ).collect()[0]
    n_docs = int(quality["n_docs"])
    n_dup_docs = int(dup_groups["n_dup_docs"] or 0)
    summary = {
        "layer": "corpus",
        "n_docs": n_docs,
        "mean_quality": float(quality["mean_quality"]),
        "min_quality": float(quality["min_quality"]),
        "max_quality": float(quality["max_quality"]),
        "n_dup_groups": int(dup_groups["n_dup_groups"]),
        "n_dup_docs": n_dup_docs,
        "dup_rate": (n_dup_docs / n_docs) if n_docs else None,
        "language_mix": _rows(lang),
    }
    _write_rollup(lang, output, "corpus", "language_mix")
    lang.unpersist()
    return summary


def _null_counts(df: DataFrame, cols: tuple[str, ...]):
    """One-pass total rows + per-column null counts."""
    row = df.agg(
        F.count("*").alias("__n"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols],
    ).collect()[0]
    n = int(row["__n"])
    return n, {c: int(row[c] or 0) for c in cols}


def _silver(spark: SparkSession, sf_dir: str, output: str) -> dict:
    """Normalized base-series QA (reference ``run_silver_sanity``,
    ``silver/pipeline.py:407-470``): row/ticker counts, global date
    bounds, derived-feature columns present, key-feature null rates.
    The reference walks one parquet per symbol; here the same totals
    are one distributed aggregation."""
    from pipeline_mf_etl_spark.queries.windows import w1_lag_lead, w2_rolling_stats
    from pipeline_mf_etl_spark.sources.readers import load_table

    bounds = load_table(spark, sf_dir, "events").agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("user_id").alias("ticker_count"),
        F.min("ts").alias("global_min_ts"),
        F.max("ts").alias("global_max_ts"),
    ).collect()[0]
    feats = w2_rolling_stats(spark, sf_dir)
    key_features = ("sma_5", "std_5", "med_5")
    per_series = (
        feats.groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            *[F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}") for c in key_features],
        )
        .orderBy("user_id")
    ).cache()
    tot = per_series.agg(
        *[F.sum(f"n_null_{c}").alias(c) for c in key_features]
    ).collect()[0]
    n_ret, ret_nulls = _null_counts(w1_lag_lead(spark, sf_dir), ("ret_1",))
    total_rows = int(bounds["total_rows"])
    null_rates = {c: (int(tot[c] or 0) / total_rows if total_rows else None) for c in key_features}
    null_rates["ret_1"] = (ret_nulls["ret_1"] / n_ret) if n_ret else None
    summary = {
        "layer": "silver",
        "ticker_count": int(bounds["ticker_count"]),
        "total_rows": total_rows,
        "global_min_ts": str(bounds["global_min_ts"]),
        "global_max_ts": str(bounds["global_max_ts"]),
        "feature_columns_present": sorted(set(feats.columns) - {"event_id", "user_id"}),
        "key_feature_null_rates": null_rates,
        "read_errors": 0,
    }
    _write_rollup(per_series, output, "silver", "per_series_nulls")
    per_series.unpersist()
    return summary


def _indicators(spark: SparkSession, sf_dir: str, output: str) -> dict:
    """TMF/TTI indicator QA (reference ``run_indicators_sanity``,
    ``silver/indicators_pipeline.py:454-540``): null counts, zero-cross
    totals split by direction, top |tmf| per symbol."""
    from pipeline_mf_etl_spark.queries.viewer import v1_tmf_tti_panel

    pan = v1_tmf_tti_panel(spark, sf_dir)
    per = (
        pan.groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("tmf_raw").isNull().cast("long")).alias("tmf_null_count"),
            F.sum(F.col("tti_raw").isNull().cast("long")).alias("tti_null_count"),
            F.sum((F.col("tmf_zero_cross") & (F.col("tmf_raw") > 0)).cast("long")).alias(
                "tmf_zero_cross_up"
            ),
            F.sum((F.col("tmf_zero_cross") & (F.col("tmf_raw") <= 0)).cast("long")).alias(
                "tmf_zero_cross_down"
            ),
            F.sum((F.col("tti_zero_cross") & (F.col("tti_raw") > 0)).cast("long")).alias(
                "tti_zero_cross_up"
            ),
            F.sum((F.col("tti_zero_cross") & (F.col("tti_raw") <= 0)).cast("long")).alias(
                "tti_zero_cross_down"
            ),
            F.round(F.max(F.abs("tmf_raw")), 6).alias("max_abs_tmf"),
        )
        .orderBy("user_id")
    ).cache()
    sums = per.agg(
        F.count("*").alias("symbol_count"),
        *[
            F.sum(c).alias(c)
            for c in (
                "n_rows",
                "tmf_null_count",
                "tti_null_count",
                "tmf_zero_cross_up",
                "tmf_zero_cross_down",
                "tti_zero_cross_up",
                "tti_zero_cross_down",
            )
        ],
    ).collect()[0]
    top_abs = per.select("user_id", "max_abs_tmf").orderBy(
        F.desc_nulls_last("max_abs_tmf"), "user_id"
    )
    summary = {
        "layer": "indicators",
        "symbol_count": int(sums["symbol_count"]),
        "total_rows": int(sums["n_rows"]),
        "tmf_null_count": int(sums["tmf_null_count"] or 0),
        "tti_proxy_null_count": int(sums["tti_null_count"] or 0),
        "tmf_zero_cross_up_count": int(sums["tmf_zero_cross_up"] or 0),
        "tmf_zero_cross_down_count": int(sums["tmf_zero_cross_down"] or 0),
        "tti_proxy_zero_cross_up_count": int(sums["tti_zero_cross_up"] or 0),
        "tti_proxy_zero_cross_down_count": int(sums["tti_zero_cross_down"] or 0),
        "top_abs_tmf_by_symbol": _rows(top_abs, 10),
        "read_errors": 0,
    }
    _write_rollup(per, output, "indicators", "indicator_report")
    per.unpersist()
    return summary


def _events(spark: SparkSession, sf_dir: str, output: str) -> dict:
    """Event-grammar QA (reference ``run_events_sanity``,
    ``gold/pipeline.py:431-520``): key event-flag totals, global
    state-label counts, top symbols by rolling activity and by
    down-crosses ("fails")."""
    from pipeline_mf_etl_spark.queries.flow import f1_flow_states
    from pipeline_mf_etl_spark.queries.windows import (
        w8_w10_event_flags,
        w11_w13_burst_activity,
    )

    flags = w8_w10_event_flags(spark, sf_dir)
    key_cols = ("cross_up", "cross_down", "pos_hold_3", "crossed_up_last_10")
    per = (
        flags.groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            *[F.sum(F.col(c).cast("long")).alias(c) for c in key_cols],
        )
        .orderBy("user_id")
    ).cache()
    sums = per.agg(
        F.count("*").alias("symbol_count"),
        F.sum("n_rows").alias("total_rows"),
        *[F.sum(c).alias(c) for c in key_cols],
    ).collect()[0]
    state_counts = (
        f1_flow_states(spark, sf_dir)
        .groupBy("flow_state_code")
        .agg(F.count("*").alias("n"))
        .orderBy("flow_state_code")
    )
    top_activity = (
        w11_w13_burst_activity(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.round(F.avg(F.col("act_20").cast("double")), 6).alias("avg_activity_20"))
        .orderBy(F.desc_nulls_last("avg_activity_20"), "user_id")
    )
    top_fails = per.select("user_id", "cross_down").orderBy(
        F.desc("cross_down"), "user_id"
    )
    summary = {
        "layer": "events",
        "symbol_count": int(sums["symbol_count"]),
        "total_rows": int(sums["total_rows"]),
        "key_event_counts": {c: int(sums[c] or 0) for c in key_cols},
        "state_label_counts": _rows(state_counts),
        "top_by_activity": _rows(top_activity, 10),
        "top_by_fails": _rows(top_fails, 10),
        "read_errors": 0,
    }
    _write_rollup(per, output, "events", "event_flag_report")
    _write_rollup(state_counts, output, "events", "state_counts")
    per.unpersist()
    return summary


def _features(spark: SparkSession, sf_dir: str, output: str) -> dict:
    """Feature-frame QA (reference ``run_features_sanity``,
    ``gold/features_pipeline.py:452-540``): key-feature null rates,
    top symbols by average activity bias and by max |robust-scaled|
    value."""
    from pipeline_mf_etl_spark.queries.flow import f2_flow_activity
    from pipeline_mf_etl_spark.queries.stats import m2_per_group_scaler

    act = f2_flow_activity(spark, sf_dir)
    per = (
        act.groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("activity_bias").isNull().cast("long")).alias("n_null_bias"),
            F.sum(F.col("error_recency").isNull().cast("long")).alias("n_null_recency"),
            F.round(F.avg("activity_bias"), 6).alias("avg_activity_bias"),
        )
        .orderBy("user_id")
    ).cache()
    sums = per.agg(
        F.count("*").alias("symbol_count"),
        F.sum("n_rows").alias("total_rows"),
        F.sum("n_null_bias").alias("n_null_bias"),
        F.sum("n_null_recency").alias("n_null_recency"),
    ).collect()[0]
    n_rob, rob_nulls = _null_counts(m2_per_group_scaler(spark, sf_dir), ("value_robust",))
    total_rows = int(sums["total_rows"])
    summary = {
        "layer": "features",
        "symbol_count": int(sums["symbol_count"]),
        "total_rows": total_rows,
        "key_feature_null_rates": {
            "activity_bias": (int(sums["n_null_bias"] or 0) / total_rows) if total_rows else None,
            "error_recency": (int(sums["n_null_recency"] or 0) / total_rows) if total_rows else None,
            "value_robust": (rob_nulls["value_robust"] / n_rob) if n_rob else None,
        },
        "top_avg_activity_bias": _rows(
            per.select("user_id", "avg_activity_bias").orderBy(
                F.desc_nulls_last("avg_activity_bias"), "user_id"
            ),
            10,
        ),
        "read_errors": 0,
    }
    _write_rollup(per, output, "features", "feature_report")
    per.unpersist()
    return summary


def _validation(spark: SparkSession, sf_dir: str, output: str) -> dict:
    """Validation-harness QA (reference ``summarize_validation_run``,
    ``validation/sanity.py:30-88``): top states by forward-return mean
    with CI + tradability, share of pairwise diffs with sign-consistent
    CIs, top transitions by event count, stability highlights (lowest
    Frobenius drift), and NaN/null counts per artifact.

    NOTE: eager — m15/m18 run bootstrap fits at build time
    (persisted-export pattern, queries/export.py)."""
    from pipeline_mf_etl_spark.queries.stats import m15_pairwise_diff_ci
    from pipeline_mf_etl_spark.queries.validation import (
        m16_event_study,
        m17_frobenius_stability,
        m18_hardening_policy,
    )

    scorecard = m18_hardening_policy(spark, sf_dir).cache()
    top_states = scorecard.orderBy(F.desc_nulls_last("mean_fwd"), "state_id")
    score_nulls = scorecard.agg(
        F.sum(F.col("mean_fwd").isNull().cast("long"))
        + F.sum(F.col("ci_half").isNull().cast("long"))
    ).collect()[0][0]
    pairwise = m15_pairwise_diff_ci(spark, sf_dir)
    pair_row = pairwise.agg(
        F.round(F.avg(F.col("diff_sign_consistent").cast("double")), 6).alias("share"),
        (
            F.sum(F.col("diff_ci_lo").isNull().cast("long"))
            + F.sum(F.col("diff_ci_hi").isNull().cast("long"))
        ).alias("nulls"),
    ).collect()[0]
    transitions = (
        m16_event_study(spark, sf_dir)
        .groupBy("transition")
        .agg(F.sum("n_obs").alias("count_events"))
        .orderBy(F.desc("count_events"), "transition")
    )
    stability = m17_frobenius_stability(spark, sf_dir).orderBy(
        F.asc_nulls_last("frobenius_dist"), "window_id"
    )
    summary = {
        "layer": "validation",
        "top_states_by_fwd_ret_mean": _rows(top_states, 10),
        "pairwise_significant_diff_share": (
            float(pair_row["share"]) if pair_row["share"] is not None else None
        ),
        "top_transition_codes": _rows(transitions, 10),
        "state_stability_highlights": _rows(stability, 10),
        "nan_warnings": {
            "state_scorecard_null_count": int(score_nulls or 0),
            "pairwise_null_count": int(pair_row["nulls"] or 0),
        },
    }
    _write_rollup(scorecard, output, "validation", "state_scorecard")
    _write_rollup(transitions, output, "validation", "transition_summary")
    scorecard.unpersist()
    return summary


def _grid(spark: SparkSession, sf_dir: str, output: str) -> dict:
    """Sensitivity-grid QA (reference ``summarize_grid_run``,
    ``backtest/sensitivity_sanity.py:41-120``): combo-key uniqueness,
    non-finite metric cells, zero-trade combos, invalid robustness for
    traded combos, top combos by robustness."""
    from pipeline_mf_etl_spark.queries.backtest import b10_sensitivity_grid

    grid = b10_sensitivity_grid(spark, sf_dir).cache()
    metric_cols = ("expectancy", "win_rate", "net_std", "p10", "p90", "robustness_score")
    nonfinite = [
        F.sum(
            (F.isnan(F.col(c).cast("double")) | (F.abs(F.col(c).cast("double")) == float("inf")))
            .cast("long")
        ).alias(f"nf_{c}")
        for c in metric_cols
    ]
    nulls = [F.sum(F.col(c).isNull().cast("long")).alias(f"nu_{c}") for c in metric_cols]
    row = grid.agg(
        F.count("*").alias("n_combos"),
        F.countDistinct("hold_bars", "cost_bps").alias("n_unique_combos"),
        F.sum((F.col("n_trades") == 0).cast("long")).alias("zero_trade_combos"),
        F.sum(
            (
                (F.col("n_trades") > 0)
                & (F.col("robustness_score").isNull() | F.isnan("robustness_score"))
            ).cast("long")
        ).alias("invalid_robustness"),
        *nonfinite,
        *nulls,
    ).collect()[0]
    errors = []
    if int(row["n_combos"]) == 0:
        errors.append("empty_manifest")
    if int(row["n_combos"]) != int(row["n_unique_combos"]):
        errors.append("duplicate_combo_id")
    non_finite_cells = sum(int(row[f"nf_{c}"] or 0) for c in metric_cols)
    if non_finite_cells > 0:
        errors.append("non_finite_metrics_cells")
    if int(row["invalid_robustness"] or 0) > 0:
        errors.append("invalid_robustness_for_non_zero_trades")
    top = grid.orderBy(F.desc_nulls_last("robustness_score"), "hold_bars", "cost_bps")
    summary = {
        "layer": "grid",
        "n_combos": int(row["n_combos"]),
        "zero_trade_combos": int(row["zero_trade_combos"] or 0),
        "non_finite_metric_cells": non_finite_cells,
        "null_metric_cells": sum(int(row[f"nu_{c}"] or 0) for c in metric_cols),
        "errors": errors,
        "status": "FAIL" if errors else "PASS",
        "top_combos_by_robustness": _rows(top, 10),
    }
    _write_rollup(grid, output, "grid", "grid_metrics_table")
    grid.unpersist()
    return summary


_RUNNERS = {
    "bronze": _bronze,
    "silver": _silver,
    "indicators": _indicators,
    "events": _events,
    "features": _features,
    "research": _research,
    "backtest": _backtest,
    "validation": _validation,
    "grid": _grid,
    "corpus": _corpus,
}


def run_sanity(spark: SparkSession, sf_dir: str, output: str, layer: str) -> dict:
    """Run one layer's sanity checks; write the QA summary JSON + rollup
    parquet/CSV twins under ``<output>/<layer>_qa/``; return the summary."""
    if layer not in _RUNNERS:
        raise ValueError(f"unknown layer {layer!r}; choose from {LAYERS}")
    summary = _RUNNERS[layer](spark, sf_dir, output)
    summary["generated_ts"] = datetime.now(timezone.utc).isoformat()
    summary["sf_dir"] = sf_dir
    write_json_artifact(summary, f"{output}/{layer}_qa/{layer}_sanity_summary.json")
    return summary
