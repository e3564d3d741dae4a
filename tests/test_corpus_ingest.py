"""Certification of the corpus-ingestion queries (c1-c4/t15/wd1 and the
mm25-mm29 codec legs, registered in the r11 window): full oracle parity
at the driver's correctness scale plus the plan-shape contracts — this
file runs the driver's exact canonical compare."""

from __future__ import annotations

from tests.conftest import canonical_rows

from pipeline_mf_etl_spark.queries import all_queries

SF_ORACLE = "/root/testdata/sf0.01"


def _spec(name):
    return all_queries()[name]


def _compare(spark, duck, name):
    spec = _spec(name)
    fn, oracle = spec.spark, spec.oracle
    sdf = fn(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert canonical_rows(srows, sdf.columns) == canonical_rows(drows, dcols), name
    return len(srows)


def test_c1_warc_extract_matches_oracle(spark, duck):
    assert _compare(spark, duck, "c1_warc_extract") == 500


def test_t15_html_extract_matches_oracle(spark, duck):
    assert _compare(spark, duck, "t15_html_extract") == 500


def test_wd1_webdataset_roundtrip_matches_oracle(spark, duck):
    assert _compare(spark, duck, "wd1_webdataset_roundtrip") > 0


def test_t15_plan_is_pure_jvm_projection(spark):
    """The boilerplate strip must stay JVM column algebra: no Python
    evaluation, no data-dependent shuffle (the single round-robin
    exchange is the small-input fan-out — a no-op at production split
    counts), and each regex chain evaluated ONCE (the inlined form put
    44 regexp_replace nodes in the plan; staged selects keep 16)."""
    fn = _spec("t15_html_extract").spark
    plan = fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange roundrobinpartitioning") <= 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("regexp_replace") <= 16, plan.count("regexp_replace")


def test_c1_plan_is_single_map_pass(spark):
    fn = _spec("c1_warc_extract").spark
    plan = fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange roundrobinpartitioning") <= 1  # fan-out only


def test_wd1_plan_has_exactly_two_exchanges(spark):
    """One for the shard build groupBy, one for the stats groupBy —
    anything more means the loader side grew a shuffle it must not have."""
    fn = _spec("wd1_webdataset_roundtrip").spark
    plan = fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Exchange") == 2


def test_corpus_family_registered_and_recert_window_pinned():
    """All corpus-ingestion queries stay registered, and the r15 window
    leads with the two r14 registrations never driver-sampled (o20,
    c16 — r14 verdict task 10), then every r15 optimization-round
    rewrite plus the r14 §13-§17 rewrite set the verdict asked sampled —
    the rows whose re-hash this round exists to obtain."""
    from pipeline_mf_etl_spark.queries.registry import _PRIORITY

    family = {
        "c1_warc_extract", "c2_zip_extract", "c3_pdf_extract",
        "c4_avro_extract", "c5_lz4_extract", "c6_snappy_extract",
        "c7_zstd_extract", "c8_seekable_extract", "c9_bzip2_extract",
        "c10_shard_lookup", "c11_xz_extract", "c12_bz2_dump_lookup",
        "c13_tfrecord_lookup", "c14_arrow_lookup",
        "c15_safetensors_lookup", "c16_npz_lookup",
        "t15_html_extract", "wd1_webdataset_roundtrip",
        "mm25_flac_decode", "mm26_mp3_probe", "mm27_tiff_probe",
        "mm28_webp_probe", "mm29_webm_probe",
    }
    assert family <= set(all_queries())
    assert _PRIORITY[:2] == ("o20_weighted_reservoir", "c16_npz_lookup")
    rewrites_r15 = {
        "d2_minhash_lsh", "d5_neardup_groups", "d7_curation_waterfall",
        "g1_pagerank_neardup", "r1_bm25_topk", "mm25_flac_decode",
        "d8_substring_dedup", "t13_perplexity_buckets", "w22_funnel_steps",
        "d4_ngram_jaccard", "m17_frobenius_stability", "g3_triangle_count",
        "o11_split_leakage",
    }
    assert set(_PRIORITY[2:15]) == rewrites_r15


def test_mm25_flac_decode_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm25_flac_decode") > 0


def test_mm26_mp3_probe_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm26_mp3_probe") == 500


def test_c2_zip_extract_matches_oracle(spark, duck):
    assert _compare(spark, duck, "c2_zip_extract") == 500


def test_c3_pdf_extract_matches_oracle(spark, duck):
    assert _compare(spark, duck, "c3_pdf_extract") == 500


def test_mm27_tiff_probe_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm27_tiff_probe") == 500


def test_mm27b_tiff_decode_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm27b_tiff_decode") == 500


def test_mm28_webp_probe_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm28_webp_probe") == 500


def test_mm28b_webp_lossless_decode_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm28b_webp_lossless_decode") == 500


def test_mm29_webm_probe_matches_oracle(spark, duck):
    assert _compare(spark, duck, "mm29_webm_probe") == 500


def test_c4_avro_extract_matches_oracle(spark, duck):
    assert _compare(spark, duck, "c4_avro_extract") == 500
