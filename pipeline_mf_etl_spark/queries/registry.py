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
# correctness harness certifies the first 50 registered queries; the
# _PRIORITY tuple below pins the ROUND-8 window exactly (see its section
# comments). OUTSIDE the round-8 window (all green r6/r7 on code
# untouched this round): the r7 window (retrieval/graph/BPE/PCA/
# sampling/multimodal/streaming promotions), the dedup/similarity/text/
# corpus families certified in r6, and the ML fit family — rotate back
# in next round any of those whose files change, plus whatever round 8
# adds.
# NOTE: viewer's v2 oracle imports queries.backtest at decoration time,
# so keep backtest ahead of viewer in this list (otherwise backtest's
# queries register mid-viewer-import and the fill order shifts).
_QUERY_MODULES = (
    "pipeline_mf_etl_spark.queries.validation",
    "pipeline_mf_etl_spark.queries.backtest",
    "pipeline_mf_etl_spark.queries.dedup",
    "pipeline_mf_etl_spark.queries.flow",
    "pipeline_mf_etl_spark.queries.text",
    "pipeline_mf_etl_spark.queries.similarity",
    "pipeline_mf_etl_spark.queries.streaming",
    "pipeline_mf_etl_spark.queries.multimodal",
    "pipeline_mf_etl_spark.queries.viewer",
    "pipeline_mf_etl_spark.queries.corpus",
    "pipeline_mf_etl_spark.queries.ml",
    "pipeline_mf_etl_spark.queries.quality",
    "pipeline_mf_etl_spark.queries.windows",
    "pipeline_mf_etl_spark.queries.relational",
    "pipeline_mf_etl_spark.queries.stats",
    # registers LAST (outside the r4 window; certify in r5): imports SQL
    # fragments from dedup + text, both already loaded by this point
    "pipeline_mf_etl_spark.queries.curation",
    # register last (round-6 rotation queue): BM25/hybrid retrieval and
    # the near-dup graph analytics
    "pipeline_mf_etl_spark.queries.retrieval",
    "pipeline_mf_etl_spark.queries.graph",
)

# ROUND-8 WINDOW (the r7 verdict's ranked #1 task): after r7's all-green
# sweep the backlog is zero, so this window is pure staleness rotation —
# the 33 rows whose latest driver green is the r3 window (code untouched
# since; local parity re-proves them every round) go FIRST, then the
# round-8 edits/additions that need (re-)certification (mm13 JPEG decode
# and mm14 MP4 demux are new; d10 moves to masked-position blocking, d11
# to one-sided containment candidates, i5 is rewired through the shared
# manifest-merge path), then the oldest r4-green rows (the B-family)
# fill the 50 slots. Rotated out (all green r7, code untouched): the r7
# window. After r8 no certification is older than r4; rotate the
# remaining r4 rows (m1/m2/m8, j8, m12, m16-m21 companions) in round 9.
_PRIORITY = (
    # --- (1) the 33 r3-stale certifications (verdict r7 task 1) ---
    "p1_normalize",
    "p2_p3_quality_flags",
    "p4_quality_report",
    "p6_input_cleaning",
    "p7_filters",
    "a1_grouped_stats",
    "a2_conditional_aggregates",
    "a4_horizontal_aggs",
    "a5_crosstab",
    "a6_rows_by_year",
    "a8_topk_parts",
    "a9_null_rates",
    "a12_quantile_edges",
    "a13_orders_by_year",
    "w4_cumulative",
    "w5_bars_since_event",
    "w6_run_length",
    "w7_pivot_detection",
    "w8_w10_event_flags",
    "w11_w13_burst_activity",
    "w14_forward_labels",
    "w15_duplicate_flag",
    "w16_dedupe_keep_first",
    "w17_latest_per_group",
    "w18_range_window",
    "j2_broadcast_enrich",
    "j5_state_mapping",
    "j6_overlay_coverage",
    "m13_bootstrap_ci",
    "m14_block_bootstrap",
    "m15_pairwise_diff_ci",
    "o4b_hash_sample",
    "o6_anti_join",
    # --- (2) round-8 new/edited code needing (re-)certification ---
    "mm13_jpeg_decode",
    "mm14_mp4_demux",
    "d10_record_linkage",
    "d11_containment",
    "i5_manifest_merge",
    # --- (3) oldest r4-green rows (B-family) to fill 50; b12 stays out
    #     this round (r4-green, heaviest of the family) and leads r9 ---
    "b1_input_adapter",
    "b2_state_eligibility",
    "b3_overlay_pass_modes",
    "b4_execution_realism",
    "b5_signals",
    "b6_trade_sim",
    "b7_trade_metrics",
    "b8_equity_curve",
    "b10_sensitivity_grid",
    "b11_robustness_score",
    # m6's fallback became the exact in-house HDBSCAN in r8, and t14 is
    # brand-new — changed/never-certified code outranks stale-but-
    # untouched code for the last two slots; b12-b15 (r4-green,
    # untouched) lead the r9 rotation
    "m6_density_clusters",
    "t14_boilerplate_lines",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""
    #: True when the builder executes driver-side actions at BUILD time
    #: (model fit, sketch probe, persisted export) instead of returning a
    #: purely lazy plan. Callers that build-without-executing should
    #: expect side effects (parquet exports under .artifacts/) from these.
    eager: bool = False


def query(name: str, oracle: str | None = None, doc: str = "", eager: bool = False):
    """Decorator registering a Spark query (and optional DuckDB oracle).

    ``eager=True`` marks builders that materialize at build time (the
    model-fit / sketch families) — see ``QuerySpec.eager``.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc or (fn.__doc__ or "").strip(), eager
        )
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
