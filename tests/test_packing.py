"""Sequence-packing invariants: next-fit recurrence edge cases the
hash-parity run can't isolate (oversize docs, zero-token docs, exact
fits), budget accounting, and repartition determinism."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.packing import (
    PACK_BUDGET,
    pack_next_fit,
)


def _pack_local(items, budget):
    """Reference next-fit: list of (doc_id, n_tokens) in doc_id order →
    {doc_id: seq_id}."""
    out, fill, s = {}, 0, 1
    for i, (doc_id, t) in enumerate(sorted(items)):
        if i > 0 and fill + t > budget:
            s, fill = s + 1, 0
        fill += t
        out[doc_id] = s
    return out


@pytest.fixture(scope="module")
def packed(spark):
    rng = np.random.default_rng(3)
    rows = [(int(i), int(t)) for i, t in enumerate(rng.integers(0, 120, size=400))]
    # edge cases: oversize (> budget), exactly-budget, zero-token docs
    rows += [(400, PACK_BUDGET + 37), (401, PACK_BUDGET), (402, 0), (403, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return rows, pack_next_fit(df).collect()


def test_next_fit_matches_reference(packed):
    rows, out = packed
    assert len(out) == len(rows)
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    toks = dict(rows)
    for bucket, members in by_bucket.items():
        expect = _pack_local([(r["doc_id"], toks[r["doc_id"]]) for r in members], PACK_BUDGET)
        got = {r["doc_id"]: r["seq_id"] for r in members}
        assert got == expect, f"bucket {bucket}"


def test_sequence_accounting(packed):
    _, out = packed
    seqs: dict[tuple, list] = {}
    for r in out:
        seqs.setdefault((r["bucket"], r["seq_id"]), []).append(r)
    for (bucket, seq_id), members in seqs.items():
        total = sum(r["n_tokens"] for r in members)
        assert all(r["seq_tokens"] == total for r in members)
        assert all(r["seq_n_docs"] == len(members) for r in members)
        # a sequence exceeds the budget ONLY as a lone oversize doc:
        # members after the first are admitted only when fill stays
        # within budget, and an oversize opener rejects every follower
        if total > PACK_BUDGET:
            assert len(members) == 1 and members[0]["n_tokens"] > PACK_BUDGET
    # seq ids are dense 1..max per bucket
    by_bucket: dict[int, set] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], set()).add(r["seq_id"])
    for bucket, ids in by_bucket.items():
        assert ids == set(range(1, max(ids) + 1)), f"bucket {bucket}"


def test_oversize_doc_sits_alone(packed):
    _, out = packed
    big = next(r for r in out if r["doc_id"] == 400)
    assert big["seq_n_docs"] == 1
    assert big["seq_tokens"] == PACK_BUDGET + 37


def test_repartition_invariant(spark):
    """Packing must be identical regardless of input partitioning —
    the bucket hash, not Spark's physical layout, decides placement."""
    rows = [(int(i), int(t)) for i, t in enumerate([50, 200, 256, 0, 300, 17, 90] * 30)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = {(r["doc_id"], r["bucket"], r["seq_id"]) for r in pack_next_fit(df).collect()}
    b = {
        (r["doc_id"], r["bucket"], r["seq_id"])
        for r in pack_next_fit(df.repartition(17, "n_tokens")).collect()
    }
    assert a == b


def test_o12_single_shuffle_plan(spark):
    """The packing plan's only exchange is the bucket groupBy."""
    from pipeline_mf_etl_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["o12_sequence_packing"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
