"""BM25 lexical retrieval: hand-computed scores on a tiny corpus, plan
shape (broadcast query side, no cartesian), and candidate pruning."""

from __future__ import annotations

import math

from pipeline_mf_etl_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk


def _expected_bm25(corpus: dict[str, list[str]], qterms: list[str], k1: float, b: float):
    """Pure-Python reference BM25 (independent of the Spark code path)."""
    n = float(len(corpus))
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {
        t: float(sum(1 for toks in corpus.values() if t in toks)) for t in set(qterms)
    }
    out = {}
    for doc, toks in corpus.items():
        s = 0.0
        for t in set(qterms):
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            out[doc] = round(s, 6)
    return out


def test_bm25_matches_hand_computation(spark):
    corpus = {
        "1": "apple banana apple".split(),
        "2": "banana cherry".split(),
        "3": "cherry cherry cherry apple".split(),
        "4": "durian fig grape".split(),
    }
    docs = spark.createDataFrame(
        [(int(d), " ".join(toks)) for d, toks in corpus.items()],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(7, "apple cherry")], "query_id long, qtext string")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    exp = _expected_bm25(corpus, ["apple", "cherry"], BM25_K1, BM25_B)
    # doc 4 shares no query term: pruned, never scored
    assert (7, 4) not in got
    assert set(got) == {(7, int(d)) for d in exp}
    for d, score in exp.items():
        assert got[(7, int(d))][0] == score
    # ranks are dense 1..n by descending score with doc_id tie-break
    ranked = sorted(got.values(), key=lambda v: v[1])
    assert [r for _, r in ranked] == list(range(1, len(ranked) + 1))
    assert all(ranked[i][0] >= ranked[i + 1][0] for i in range(len(ranked) - 1))


def test_bm25_plan_broadcasts_query_side(spark):
    """The query-term join must be a broadcast (map-side candidate
    pruning — the corpus postings are never shuffled by query terms),
    and nothing may be a cartesian product."""
    from pipeline_mf_etl_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["r1_bm25_topk"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rrf_fuse_hand_computed(spark):
    from pipeline_mf_etl_spark.operators.retrieval import rrf_fuse

    sparse = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, rank int"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(sparse, dense, k=10).collect()}
    assert rows[10]["rrf"] == round(1 / 61, 6)
    assert rows[11]["rrf"] == round(1 / 62 + 1 / 61, 6)
    assert rows[12]["rrf"] == round(1 / 62, 6)
    # doc 11 appears in both modalities and wins; one-sided ranks are null
    assert [rows[d]["rank"] for d in (11, 10, 12)] == [1, 2, 3]
    assert rows[10]["rank_dense"] is None and rows[12]["rank_sparse"] is None


def test_shard_shuffle_single_exchange(spark):
    """o15's only shuffle may be the N-way hash partition by shard
    (the within-shard rank); assignment itself is map-only."""
    from pipeline_mf_etl_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["o15_shard_shuffle"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
