"""Property tests for PageRank and RRF fusion — invariants that must
hold on ANY input, pinned with hypothesis-generated graphs/rankings."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_mf_etl_spark.operators.graph import pagerank
from pipeline_mf_etl_spark.operators.retrieval import rrf_fuse

_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
    unique=True,
)


@settings(max_examples=3, deadline=None)
@given(_edges)
def test_pagerank_mass_and_bounds(spark, pairs):
    """On any undirected pair graph: ranks are positive, total mass ≈ 1
    (every node has out-degree ≥ 1, so no damping leak beyond the
    per-iteration 9-dp rounding), and every edge endpoint gets a rank."""
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["r"] for r in pagerank(df).collect()}
    nodes = {n for e in pairs for n in e}
    assert set(got) == nodes
    assert all(v > 0 for v in got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-5 * max(1, len(nodes))


@settings(max_examples=3, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
    st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
)
def test_rrf_respects_both_rankings(spark, docs_a, docs_b):
    """Fusion output contains exactly the union of both top lists; a doc
    present in BOTH lists always outranks (scores >=) any doc holding
    strictly worse positions in both."""
    a = spark.createDataFrame(
        [(1, d, i + 1) for i, d in enumerate(docs_a)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, d, i + 1) for i, d in enumerate(docs_b)], "query_id long, doc_id long, rank int"
    )
    rows = rrf_fuse(a, b, k=100).collect()
    assert {r["doc_id"] for r in rows} == set(docs_a) | set(docs_b)
    score = {r["doc_id"]: r["rrf"] for r in rows}
    pos_a = {d: i + 1 for i, d in enumerate(docs_a)}
    pos_b = {d: i + 1 for i, d in enumerate(docs_b)}
    for d in set(docs_a) & set(docs_b):
        for e in set(docs_a) | set(docs_b):
            if e == d:
                continue
            if pos_a.get(e, 10**6) >= pos_a[d] and pos_b.get(e, 10**6) >= pos_b[d]:
                assert score[d] >= score[e], (d, e)
