"""Invariants for the non-SQL-expressible multimodal featurizer (mm2):
row preservation, histogram normalization, hash determinism, and the
decode gate."""

from __future__ import annotations

import hashlib

import pytest

from pipeline_mf_etl_spark.operators.multimodal import (
    decode_media,
    extract_byte_features,
    with_binary_payload,
)
from pipeline_mf_etl_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def feats(spark):
    docs = with_binary_payload(load_table(spark, SF_SMOKE, "documents"))
    return docs, [r.asDict() for r in extract_byte_features(docs).collect()]


def test_row_preservation_and_hist(feats):
    docs, rows = feats
    assert len(rows) == docs.count() > 0
    for r in rows:
        assert len(r["byte_hist"]) == 16
        assert abs(sum(r["byte_hist"]) - 1.0) < 1e-9
        assert r["n_bytes"] > 0
        assert 0.0 <= r["byte_mean"] <= 255.0


def test_sha256_matches_local(feats, spark):
    docs, rows = feats
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").limit(50).collect()}
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id, text in texts.items():
        expected = hashlib.sha256(text.encode("utf-8")).hexdigest()
        assert by_id[doc_id]["payload_sha256"] == expected


def test_decode_gate():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image/png")
