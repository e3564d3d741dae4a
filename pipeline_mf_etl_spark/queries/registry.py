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
# _PRIORITY tuple below pins the current certification window exactly
# and is the SINGLE source of truth for the rotation (the r12 verdict
# asked that the prose never restate the list — read the tuple).
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
    # corpus ingestion (c1-c4, t15, wd1) right after multimodal, whose
    # probe queries it composes with (registered r11)
    "pipeline_mf_etl_spark.queries.corpus_ingest",
    # URL-layer curation (t16/d12, new r11)
    "pipeline_mf_etl_spark.queries.urls",
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

# ROUND-13 WINDOW (the r12 verdict's ranked task 1): the 16 queries
# whose latest green is r8 (4 rounds of drift risk) re-certify FIRST,
# then this round's new code (st13/c9, inserted when registered), then
# the oldest r9 cohort fills the remaining slots — composed dedup/ANN
# parents first, then text/viewer/backtest/stats chains. Names past
# slot 50 stay ordered and head the r14 rotation (the staleness test
# below forces them into the r14 window mechanically).
# Rotated out (green r10-r12, code untouched): the r12 window.
# The permanently-red no-oracle variants (a16/a17/a18/o4) are
# driver_visible=False — certified via their exact twins + property
# tests — so no window can contain a red-by-design row.
_PRIORITY = (
    # --- (1) the 16 r8-stale re-certs (verdict task 1 head) ---
    "j5_state_mapping",
    "j6_overlay_coverage",
    "a8_topk_parts",
    "a9_null_rates",
    "a12_quantile_edges",
    "a13_orders_by_year",
    "b10_sensitivity_grid",
    "b11_robustness_score",
    "d10_record_linkage",
    "d11_containment",
    "m6_density_clusters",
    "m13_bootstrap_ci",
    "m14_block_bootstrap",
    "m15_pairwise_diff_ci",
    "o6_anti_join",
    "t14_boilerplate_lines",
    # --- (2) new r13 code ---
    "st13_dropzone_ingest",
    "c9_bzip2_extract",
    # --- (3) r9 cohort fill: dedup/ANN chains first ---
    "d1_exact_dedupe",
    "d3_simhash",
    "d4_ngram_jaccard",
    "d5_neardup_groups",
    "d6_canonical_docs",
    "d7_curation_waterfall",
    "d8_substring_dedup",
    "e1_ann_bruteforce",
    "e2_ann_bucketed",
    "e3_embedding_neardup",
    "e4_ann_ivf",
    "e5_ann_pq",
    "e6_ann_ivfpq",
    "t2_quality_score",
    "t3_top_terms",
    "t4_fingerprint",
    "t5_token_stats",
    "v1_tmf_tti_panel",
    "v2_viewer_markers",
    "v3_reading_labels",
    "b12_walkforward_grid",
    "b13_candidate_drift",
    "b14_calibration_sweep",
    "b15_equity_summary",
    "m1_global_scaler",
    "m2_per_group_scaler",
    "m8_state_profiles",
    "m12_dwell_stats",
    "m17_frobenius_stability",
    "m17_trend_slope",
    "m18_hardening_policy",
    "j8_transition_matrix",
    # --- names below slot 50 head the r14 rotation: this round's
    # post-window registration (c10, certifying the r13-built seekable
    # shard layout end to end), then the three r9 rows that slipped
    # past slot 50, then the 10 mm r9 rows (enforced into the r14
    # window by test_no_certification_older_than_four_rounds) ---
    "c10_shard_lookup",
    "c11_xz_extract",
    "g3_triangle_count",
    "w22_funnel_steps",
    "st2_sliding_windows",
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
    #: False for the sketch / native-RNG variants whose outputs are
    #: engine-specific by design (GK/CMS/HLL estimates, Spark's sample
    #: RNG). Each has a hash-certified exact twin on the driver surface
    #: (a16b/a17b/a18b/o4b) and error-bound property tests in pytest
    #: (tests/test_sketches.py); exposing the variant itself to the
    #: driver would yield a permanently-red rows-only row, so
    #: __spark_entry__.queries() filters these out.
    driver_visible: bool = True


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    eager: bool = False,
    driver_visible: bool = True,
):
    """Decorator registering a Spark query (and optional DuckDB oracle).

    ``eager=True`` marks builders that materialize at build time (the
    model-fit / sketch families) — see ``QuerySpec.eager``.
    ``driver_visible=False`` keeps a query in the internal registry (lib
    tests, bench) but off the driver contract — see ``QuerySpec.driver_visible``.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc or (fn.__doc__ or "").strip(), eager, driver_visible
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
