"""Central query registry.

Each query is a pair: a Spark callable ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) an equivalent ANSI-SQL oracle string run by
DuckDB over the same parquet tables. Column names are aligned on both
sides (the comparison sorts columns by name before hashing values), and
every computed double is rounded to a fixed precision on BOTH sides so
accumulation-order ulp drift cannot flip the hash.

Contract note: builders are lazy (return an unexecuted plan) EXCEPT the
model-fit and sketch-probe families (ml.py, a17), which necessarily run
driver actions at build time — a model must be fit / a sketch blob read
before the result frame exists. Those are flagged in their docstrings;
callers that need strict laziness should treat them as materializing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import. Order matters: the driver's
# correctness harness certifies the first 50 registered queries. Round-3
# rotation: the round-2 window certified the backtest/dedup/text/
# similarity/flow/streaming/validation/multimodal families (all green),
# so those register LAST; the filler slots after _PRIORITY re-certify
# the families whose last green row is round 1 (quality/windows/
# relational/stats) under the current code.
_QUERY_MODULES = (
    "pipeline_mf_etl_spark.queries.corpus",
    "pipeline_mf_etl_spark.queries.ml",
    "pipeline_mf_etl_spark.queries.quality",
    "pipeline_mf_etl_spark.queries.windows",
    "pipeline_mf_etl_spark.queries.relational",
    "pipeline_mf_etl_spark.queries.stats",
    "pipeline_mf_etl_spark.queries.validation",
    "pipeline_mf_etl_spark.queries.backtest",
    "pipeline_mf_etl_spark.queries.dedup",
    "pipeline_mf_etl_spark.queries.text",
    "pipeline_mf_etl_spark.queries.similarity",
    "pipeline_mf_etl_spark.queries.flow",
    "pipeline_mf_etl_spark.queries.streaming",
    "pipeline_mf_etl_spark.queries.multimodal",
)

# Explicit front-of-queue names (certification priority within the driver's
# 50-query window). Round-3 set = the 8 round-1 hash-fails whose oracles
# were fixed after the round-1 run (driver's last word on them is stale
# FAIL), + the 4 queries registered after the round-2 window filled
# (never driver-certified), + the ML queries that gained real DuckDB
# oracles this round (previously no_oracle).
_PRIORITY = (
    # fixed after r1 (oracle-side BIGINT casts) — need driver re-cert
    "p2_p3_quality_flags",
    "p4_quality_report",
    "a2_conditional_aggregates",
    "a4_horizontal_aggs",
    "a9_null_rates",
    "a13_orders_by_year",
    "j6_overlay_coverage",
    "w15_duplicate_flag",
    # never driver-certified (registered at positions 51+ in r2)
    "t6_pii_scrub",
    "o9_stratified_sample",
    "a16_approx_quantiles",
    "a17_heavy_hitters",
    # newly oracled this round (were no_oracle in r2): model fits /
    # resampling persist their intermediate (queries/export.py) and the
    # oracle reads the same parquet
    "m4_kmeans_profile",
    "m20_ari_vs_truth",
    "m5_gmm_mixture",
    "m10_hmm_states",
    "m13_bootstrap_ci",
    "m14_block_bootstrap",
    "m15_pairwise_diff_ci",
    "e4_ann_ivf",
    # new operators this round (never registered before)
    "t7_repetition_quality",
    "t8_contamination",
    "st5_stream_dedupe",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a Spark query (and optional DuckDB oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            continue  # module not built yet; registry stays partial
    ordered: dict[str, QuerySpec] = {}
    # Module order already front-loads the least-certified families; within
    # that, _PRIORITY pulls named stragglers to the very front.
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        ordered.setdefault(name, spec)
    return ordered
