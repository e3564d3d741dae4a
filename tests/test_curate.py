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
