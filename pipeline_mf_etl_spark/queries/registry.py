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
# correctness harness certifies the first 50 registered queries. Round-4
# rotation: round 3 certified the quality/windows/relational families
# plus the priority set (all green), so those register LAST; the filler
# slots after _PRIORITY re-certify validation, backtest, and d1/d2 (last
# green row round 2). OUTSIDE the round-4 window, rotate in first next
# round: (a) round-2-green-on-unchanged-code backlog — m16_event_study,
# m21_walkforward, d3_simhash, d4_ngram_jaccard, w3_ewm_wilder,
# f1_flow_states, f2_flow_activity; (b) NEW late-round-4 queries never
# driver-certified (local parity green) — d6_canonical_docs,
# t9_trigram_lm, m7b_silhouette_sampled, st7_stream_neardup,
# d7_curation_waterfall, e5_ann_pq, e6_ann_ivfpq, o11_split_leakage,
# t10_source_quality, st8_stream_quality_route.
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
)

# Explicit front-of-queue names (certification priority within the driver's
# 50-query window). Round-4 set = queries that are NEW or semantically
# CHANGED this round (b6 gained its recursive-CTE oracle, m7's schema
# renamed the silhouette column, mm4/v1-v3 are new), + the queries whose
# implementation was modified in round 3 AFTER their last driver
# certification (VERDICT r3 "what's wrong" #1 — parity-green locally but
# the hard signal is one round stale).
_PRIORITY = (
    # new or changed this round — never certified in current form
    "b6_trade_sim",
    "m7_cluster_quality",
    "mm4_wav_decode",
    "v1_tmf_tti_panel",
    "v2_viewer_markers",
    "v3_reading_labels",
    # r3-modified but last certified r1/r2 (similarity norm precompute,
    # dedupe checkpoint freeing, text tokenization reuse, scaler/profile
    # refactors, mm2 oracle hardening, streaming transforms)
    "e1_ann_bruteforce",
    "e2_ann_bucketed",
    "e3_embedding_neardup",
    "d5_neardup_groups",
    "t1_lang_id",
    "t2_quality_score",
    "t3_top_terms",
    "t4_fingerprint",
    "t5_token_stats",
    "mm1_binary_metadata",
    "mm2_byte_features",
    "mm3_frame_sample",
    "st1_tumbling_daily",
    "st2_sliding_windows",
    "st3_session_windows",
    "st4_stateful_user_stats",
    "m1_global_scaler",
    "m2_per_group_scaler",
    "m8_state_profiles",
    "m12_dwell_stats",
    "m17_trend_slope",
    "j8_transition_matrix",
    # r4-changed: IVF centroid fit now hash-samples (uniform draw), so
    # e4's export contents changed — recertify over the new centroids
    "e4_ann_ivf",
    # r4-changed: the decoded export now carries ts/value for the v4
    # ribbon (schema widened, builder refactored into a shared helper)
    "v4_hmm_ribbon",
    "m10_hmm_states",
    # r4-new: portfolio summary over the shared equity curve
    "b15_equity_summary",
    # r4-new: stream-static broadcast enrichment, landed after the
    # window was first pinned — never certified, so it takes the slot
    # of m16_event_study (green r2, code unchanged since; rotate m16
    # back in next round alongside m21)
    "st6_stream_enrich",
    # Explicit window tail (positions 33-50): the validation/backtest/
    # dedup families whose last green row is round 2 — several were
    # touched again this round (b4 gate refactor, b8 equity-curve
    # split, m17 global-matrix fold, d2's r3 shingle-join rework), so
    # they must recertify. m21_walkforward (green r2, untouched since)
    # yields its slot to the new o10 mixing query — rotate m21 back in
    # next round.
    "m18_hardening_policy",
    "m17_frobenius_stability",
    "b2_state_eligibility",
    "b4_execution_realism",
    "b5_signals",
    "b7_trade_metrics",
    "b8_equity_curve",
    "b10_sensitivity_grid",
    "b14_calibration_sweep",
    "b13_candidate_drift",
    "b3_overlay_pass_modes",
    "b12_walkforward_grid",
    "b1_input_adapter",
    "b11_robustness_score",
    "d1_exact_dedupe",
    "d2_minhash_lsh",
    # r4-new: token-budget corpus mixing (LLM-pipeline family)
    "o10_token_budget_mix",
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
