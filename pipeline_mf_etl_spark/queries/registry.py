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
# _PRIORITY tuple below pins the ROUND-7 window exactly (see its section
# comments). OUTSIDE the round-7 window (all green r4/r6 on code
# untouched this round): the backtest/validation/viewer families, the
# dedup/similarity/text/corpus/streaming families certified in r6, and
# the ML fit family — rotate back in next round any of those whose files
# change, plus whatever round 7 adds.
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

# ROUND-7 WINDOW (the r6 verdict's ranked #1 task): the 21 queries that
# have NEVER seen a driver check — four of which (e7, g1, g2, t12) carry
# uncertified round-6 edits — go FIRST, in a fixed order a short round
# cannot displace. The SEVENTEEN new round-7 registrations come next (the
# exact sketch twins a16b/a17b/a18b, the two foreachBatch ops promoted
# to batch-form queries, perplexity buckets, SCD2, funnel, cube,
# Z-order layout, PNG decode, OHLC resample, interval lookup, purged
# split, record linkage, manifest merge, containment), then
# the stalest green rows (the full r1-green set,
# then the oldest r3-green A/W rows) fill out the 50 slots. Rotated out
# to make room (all green r3, code untouched): a5/a6/a8/a9/a12/a13,
# j2/j5/j6, the P-family, o4b/o6, m13-m15, w7/w8-w13/w15-w18 — stalest
# of those rotate back in round 8.
_PRIORITY = (
    # --- (1) the 21 never-driver-certified queries (backlog since r5;
    #     e7/g1/g2/t12 additionally carry uncertified r6 edits) ---
    "e7_semantic_dedup",
    "g1_pagerank_neardup",
    "g2_pagerank_weighted",
    "t12_bpe_tokenize",
    "r1_bm25_topk",
    "r2_hybrid_rrf",
    "t11_gopher_rules",
    "e8_pca_project",
    "o14_chunk_windows",
    "o15_shard_shuffle",
    "o16_per_group_sample",
    "o17_weighted_sample",
    "st9_attribution_join",
    "st10_last_click",
    "mm8_audio_segments",
    "mm9_image_resize",
    "mm10_audio_downsample",
    "mm11_video_resize",
    "w19_time_decay_score",
    "w20_rolling_autocorr",
    "d9_source_dup_matrix",
    # --- (2) new round-7 registrations (first driver look) ---
    "a18b_exact_distinct",
    "st11_lsh_admission_batch",
    "st12_daily_rollup_batch",
    "t13_perplexity_buckets",
    "w21_scd2_intervals",
    "w22_funnel_steps",
    "a16b_exact_quantiles",
    "a17b_exact_heavy_hitters",
    "a19_cube",
    "o18_zorder_layout",
    "mm12_png_decode",
    "w23_ohlc_resample",
    "j13_interval_lookup",
    "o19_purged_split",
    "d10_record_linkage",
    "i5_manifest_merge",
    "d11_containment",
    # --- (3) stalest certified rows: the full r1-green set (five rounds
    #     stale) ---
    "s3_pushdown_scan",
    "i2_manifest_classify",
    "a7_region_rollup",
    "a14_salted_skew_agg",
    "a15_rollup",
    "j11_asof_join",
    "j12_star_join",
    "j7_j10_profile_joins",
    "o5_union_by_name",
    "o7_distinct_counts",
    # --- (4) oldest r3-green A/W/J/P rows to fill 50 (windows.py took
    #     the late-r5 w19/w20 appends, so its r3 members rotate first) ---
    "w1_lag_lead",
    "w2_rolling_stats",
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
