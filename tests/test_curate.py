"""Corpus-curation pipeline: waterfall accounting, survivor
cleanliness, and idempotence (curating the curated output drops
nothing)."""

from __future__ import annotations

import json
import os

import pytest

from pipeline_mf_etl_spark.corpus_curate import curate_corpus
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    report = curate_corpus(spark, SF_SMOKE, out)
    return out, report


def test_waterfall_accounts_for_every_doc(curated):
    out, report = curated
    assert report["n_input"] > 0
    assert report["n_retained"] + sum(report["dropped"].values()) == report["n_input"]
    assert 0 < report["n_retained"] <= report["n_input"]
    # the artifact on disk matches the returned report
    with open(os.path.join(out, "curation_report.json")) as fh:
        assert json.load(fh) == report


def test_survivors_pass_every_filter(spark, curated):
    out, report = curated
    from pipeline_mf_etl_spark.queries.text import (
        t2_quality_score,
        t7_repetition_quality,
        t8_contamination,
    )

    n = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    assert n == report["n_retained"]
    # re-score the curated corpus: no survivor is low-quality,
    # repetitive, or contaminated under the same thresholds
    assert (
        t2_quality_score(spark, out).filter("quality < 0.5").count() == 0
    )
    assert t7_repetition_quality(spark, out).filter("is_repetitive").count() == 0
    assert t8_contamination(spark, out).filter("contaminated").count() == 0


def test_curation_is_idempotent(spark, curated, tmp_path):
    """A second pass over the curated output must retain everything:
    all duplicates (exact and near) and all failing docs were already
    removed; re-running attributes zero drops to every stage."""
    out, report = curated
    second = curate_corpus(spark, out, str(tmp_path / "second"))
    assert second["n_input"] == report["n_retained"]
    assert second["n_retained"] == second["n_input"]
    assert all(v == 0 for v in second["dropped"].values())


def test_quality_floor_is_live(spark, tmp_path):
    """The shipped corpora all score >= 0.5, leaving the default
    quality stage with zero drops — so exercise the floor explicitly
    with a high threshold: drops must be attributed to the quality
    stage and every survivor must clear the raised bar (catches a
    </<= boundary drift or the threshold being plumbed to the wrong
    stage, which the default-threshold tests cannot)."""
    from pipeline_mf_etl_spark.queries.text import t2_quality_score

    out = str(tmp_path / "hq")
    report = curate_corpus(spark, SF_SMOKE, out, quality_min=0.9)
    assert report["quality_min"] == 0.9
    assert report["dropped"]["quality"] > 0
    assert t2_quality_score(spark, out).filter("quality < 0.9").count() == 0


def test_waterfall_attribution_on_planted_corpus(spark, tmp_path):
    """Adversarial fixture with one KNOWN case per stage — the shipped
    corpus exercises volumes, this pins exact attribution and keeper
    choice. All hashing is deterministic (md5), so the planted
    collisions behave identically on every run:

    - ids 1000/1001: same token SET, different punctuation → exact
      stage drops 1001 (min-id keeper)
    - ids 300/301/302: shared 40-token base ± two appended words
      (pairwise shingle jaccard ≈ 0.9 → deterministic-hash-stable cluster); 301/302
      carry heavy punctuation so 300 is the best-quality canonical
    - id 450: three one-letter tokens → composite quality ≈ 0.41 < 0.5
    - id 400: one word repeated 100× → repetitive
    - id 500: copies a 20-word run from benchmark doc 194 (194 % 97 == 0)
      → contaminated, but only ~18 of ~100 shingles shared so it is NOT
      a near-dup of 194
    """
    rng_words = [f"w{i}x{j}" for i in range(40) for j in range(5)]

    def mk(i, text):
        return (i, text, "en", "src0", len(text))

    rows = []
    # clean filler docs: disjoint vocabularies, high quality
    for i in range(30):
        words = [f"base{i}word{j}" for j in range(60)]
        rows.append(mk(i, " ".join(words)))
    # exact-dup pair
    base_txt = " ".join(f"exact{j}" for j in range(50))
    rows.append(mk(1000, base_txt))
    rows.append(mk(1001, base_txt + "!!! ... !!!"))
    # near-dup cluster of three
    shared = " ".join(f"near{j}" for j in range(40))
    rows.append(mk(300, shared + " tailA1 tailA2"))
    rows.append(mk(301, shared + " tailB1 tailB2" + " !!!!!" * 8))
    rows.append(mk(302, shared + " tailC1 tailC2" + " !!!!!" * 8))
    # low quality (short, one-letter tokens)
    rows.append(mk(450, "a b c"))
    # repetitive
    rows.append(mk(400, " ".join(["spam"] * 100)))
    # benchmark doc + contaminated copier
    bench_words = [f"bench{j}" for j in range(60)]
    rows.append(mk(194, " ".join(bench_words)))
    contam_words = bench_words[:20] + [f"noise{j}" for j in range(80)]
    rows.append(mk(500, " ".join(contam_words)))

    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(src + "/documents.parquet")

    out = str(tmp_path / "curated")
    report = curate_corpus(spark, src, out)

    assert report["n_input"] == len(rows)
    assert report["dropped"] == {
        "exact": 1,        # 1001
        "near": 2,         # 301, 302
        "quality": 1,      # 450
        "repetition": 1,   # 400
        "contamination": 1,  # 500
    }
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(out + "/documents.parquet").select("doc_id").collect()
    }
    assert {1000, 300, 194} <= kept
    assert kept.isdisjoint({1001, 301, 302, 400, 450, 500})
