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

Everything driver-side here is a bounded scalar/top-K collect of an
already-aggregated tiny frame — no per-row driver loops.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.sources.writers import write_csv_twin, write_json_artifact

LAYERS = ("bronze", "research", "backtest", "corpus")


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


_RUNNERS = {
    "bronze": _bronze,
    "research": _research,
    "backtest": _backtest,
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
