"""Property tests for the engine's hash primitives — ``md5_int64`` and
``md5_unit`` are the single source of every deterministic sampling /
bucketing decision (o4b, o9, o10, ml-export split, LSH folds), so their
contract is pinned directly: agreement with an independent hashlib
reimplementation, range bounds, determinism under repartitioning, and
approximate uniformity of the unit fold."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.dedupe import md5_int64, md5_unit


def _ref_fold(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=80,
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_md5_int64_matches_hashlib(spark, strings):
    """Spark's conv(substr(md5,1,15),16,10) fold must equal the plain
    hashlib reimplementation for arbitrary unicode input — this is the
    cross-engine portability claim every oracle's list_reduce fold
    relies on."""
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", md5_int64(F.col("s")).alias("h")).collect()
    }
    for s in strings:
        assert got[s] == _ref_fold(s), repr(s)


def test_md5_unit_range_determinism_uniformity(spark):
    ids = spark.range(0, 20_000)
    u = ids.select(
        "id", md5_unit(F.col("id"), "prop:").alias("u")
    )
    rows = u.collect()
    vals = [r["u"] for r in rows]
    assert all(0.0 <= v < 1.0 for v in vals)
    # deterministic under repartitioning: same id -> same key
    re_rows = {
        r["id"]: r["u"]
        for r in ids.repartition(17)
        .select("id", md5_unit(F.col("id"), "prop:").alias("u"))
        .collect()
    }
    assert all(re_rows[r["id"]] == r["u"] for r in rows)
    # approximate uniformity: decile occupancy within 3 sigma of 10%
    n = len(vals)
    for d in range(10):
        share = sum(1 for v in vals if d / 10 <= v < (d + 1) / 10) / n
        assert abs(share - 0.1) < 0.011, (d, share)
    # distinct salts decorrelate: the admitted sets under two salts
    # overlap near rate² (independent Bernoulli), not near rate
    a = {r["id"] for r in rows if r["u"] < 0.2}
    b = {
        r["id"]
        for r in ids.select("id", md5_unit(F.col("id"), "other:").alias("u")).collect()
        if r["u"] < 0.2
    }
    overlap = len(a & b) / n
    assert 0.02 < overlap < 0.06, overlap  # ~0.04 expected
