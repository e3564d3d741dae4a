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
# _PRIORITY tuple below pins the ROUND-11 window exactly (see its
# section comments). OUTSIDE the round-11 window (all green r8/r9/r10
# on code untouched this round): the r8/r9/r10 windows — rotate back in
# next round any of those whose files change, plus the ten r7-stale
# leftovers that ceded slots to this round's new queries
# (j13_interval_lookup, a7_region_rollup, a19_cube,
# d9_source_dup_matrix, o5_union_by_name, o7_distinct_counts,
# e8_pca_project, g1_pagerank_neardup, g2_pagerank_weighted,
# j7_j10_profile_joins, j11_asof_join, j12_star_join — they LEAD the
# r12 rotation).
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

# ROUND-11 WINDOW (the r10 verdict's ranked tasks 1+2): the 11
# r10-built, oracle-ready pending queries register and certify FIRST
# (c1 WARC, c2 ZIP, c3 PDF, c4 Avro, t15 HTML strip, wd1 WebDataset,
# mm25 FLAC, mm26 MP3, mm27 TIFF/EXIF, mm28 WebP, mm29 WebM), then any
# NEW r11 code, then the r7-stale rotation (45 rows were r7-latest
# after r10; the verdict's priority order — heavily-composed parents
# first: w2/w21/w23, s3, i2, r1/r2, st9-st12, the a14/a15/a16b/a17b/
# a18b tranche, then mm8-mm11/o14-o19, then the t/w/e/g tail) filled
# to exactly 50. Leftovers roll to r12 (see _QUERY_MODULES comment).
# Rotated out (green r8/r9/r10, code untouched): the r10 window.
_PRIORITY = (
    # --- (1) r10-built pending queries, registered this round ---
    "c1_warc_extract",
    "c2_zip_extract",
    "c3_pdf_extract",
    "c4_avro_extract",
    "t15_html_extract",
    "wd1_webdataset_roundtrip",
    "mm25_flac_decode",
    "mm26_mp3_probe",
    "mm27_tiff_probe",
    "mm28_webp_probe",
    "mm29_webm_probe",
    # --- (2) new r11 code (inserted as built; each insertion pops the
    # tail of section 3 into the r12 rotation) ---
    "mm27b_tiff_decode",
    "mm28b_webp_lossless_decode",
    "t16_url_canonicalize",
    "d12_url_domain_rollup",
    "c5_lz4_extract",
    "c6_snappy_extract",
    # --- (3) the r7-stale rotation, verdict priority order ---
    "w2_rolling_stats",
    "w21_scd2_intervals",
    "w23_ohlc_resample",
    "s3_pushdown_scan",
    "i2_manifest_classify",
    "r1_bm25_topk",
    "r2_hybrid_rrf",
    "st9_attribution_join",
    "st10_last_click",
    "st11_lsh_admission_batch",
    "st12_daily_rollup_batch",
    "a14_salted_skew_agg",
    "a15_rollup",
    "a16b_exact_quantiles",
    "a17b_exact_heavy_hitters",
    "a18b_exact_distinct",
    "mm8_audio_segments",
    "mm9_image_resize",
    "mm10_audio_downsample",
    "mm11_video_resize",
    "o14_chunk_windows",
    "o15_shard_shuffle",
    "o16_per_group_sample",
    "o17_weighted_sample",
    "o18_zorder_layout",
    "o19_purged_split",
    "t11_gopher_rules",
    "t12_bpe_tokenize",
    "t13_perplexity_buckets",
    "w1_lag_lead",
    "w19_time_decay_score",
    "w20_rolling_autocorr",
    "e7_semantic_dedup",
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
