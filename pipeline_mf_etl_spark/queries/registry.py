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
# _PRIORITY tuple below pins the ROUND-10 window exactly (see its
# section comments). OUTSIDE the round-10 window (all green r7/r8/r9 on
# code untouched this round): the r8 and r9 windows — rotate back in
# next round any of those whose files change, plus whatever round 11
# adds (the r7 tranche a15/a16b/a17b/a18b leads that rotation).
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

# ROUND-10 WINDOW (the r9 verdict's ranked task 1): new/edited r10
# code first — the NEW codec-routing trio (mm21 H.264 Annex-B probe,
# mm22 avc1-in-MP4, mm23 mp4a/AAC-in-MP4) plus mm14's re-cert after
# parse_mp4 grew avc1/mp4a/stss support, the GIF LZW EOI-width fix
# (mm19), stereo ADPCM (mm18), the env-cap removal (d2), the PNG
# color/Adam7 generalization (mm12 + new mm12b), the two skew variants
# (w21 segmented / w23 min_by) registering for the first time under
# their parents' oracles, and promote_manifest's optional compaction
# (i5) — then ALL 34 r6-stale rows (the oldest oracled certifications:
# streaming st1/st3-st8, the ML fit family, o9-o13, f1/f2, mm5-mm7,
# v4, the t-family stragglers, w3, a18) plus the 3 r3 no-oracle rows
# (a16/a17/o4 — rows-only by design, their exact twins re-certify in
# the same window), filled to exactly 50 with the oldest r7 row. After
# r10 the oldest oracled certification is r7. Rotated out (green
# r8/r9, code untouched): the r9 window.
_PRIORITY = (
    # --- (1) round-10 new/edited code needing (re-)certification ---
    "mm21_h264_probe",
    "mm22_avc1_route",
    "mm23_aac_route",
    "mm24_hevc_route",
    "mm14_mp4_demux",
    "mm19_gif_decode",
    "mm18_adpcm_decode",
    "mm12_png_decode",
    "mm12b_png_color",
    "d2_minhash_lsh",
    "w21_scd2_intervals_segmented",
    "w23_ohlc_resample_minby",
    "i5_manifest_merge",
    # --- (2) the 34 r6-stale rows (oldest oracled certifications) ---
    "st1_tumbling_daily",
    "st3_session_windows",
    "st4_stateful_user_stats",
    "st5_stream_dedupe",
    "st6_stream_enrich",
    "st7_stream_neardup",
    "st8_stream_quality_route",
    "m4_kmeans_profile",
    "m5_gmm_mixture",
    "m7_cluster_quality",
    "m7b_silhouette_sampled",
    "m10_hmm_states",
    "m16_event_study",
    "m20_ari_vs_truth",
    "m21_walkforward",
    "o9_stratified_sample",
    "o10_token_budget_mix",
    "o11_split_leakage",
    "o12_sequence_packing",
    "o13_temperature_mix",
    "f1_flow_states",
    "f2_flow_activity",
    "mm5_image_decode",
    "mm6_video_decode",
    "mm7_image_phash_dedup",
    "v4_hmm_ribbon",
    "t1_lang_id",
    "t6_pii_scrub",
    "t7_repetition_quality",
    "t8_contamination",
    "t9_trigram_lm",
    "t10_source_quality",
    "w3_ewm_wilder",
    "a18_approx_distinct",
    # --- (3) the 3 r3 rows (no-oracle by design; rows-only refresh) ---
    "a16_approx_quantiles",
    "a17_heavy_hitters",
    "o4_seeded_sample",
    # --- (4) the r7 fillers (a14/a15/a16b/a17b/a18b, all certified r7)
    # ceded their slots to the new codec-routing family (mm21 Annex-B,
    # mm22 avc1, mm23 mp4a, mm24 hvc1) and mm14's re-cert after
    # parse_mp4 grew avc1/hvc1/mp4a/stss; they lead the r11 rotation,
    # TOGETHER WITH the four r10-built, oracle-ready pending queries in
    # queries/corpus_ingest.PENDING_QUERIES (c1 WARC, t15 HTML strip,
    # wd1 WebDataset, mm25 FLAC) — registering those is r11 task #1 ---
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
