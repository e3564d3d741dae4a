"""PageRank: hand-computed reference on a small graph, invariants, and
the empty-graph guard."""

from __future__ import annotations

from pipeline_mf_etl_spark.operators.graph import PR_DAMPING, PR_ITERS, pagerank


def _reference_pr(pairs, damping, iters):
    """Pure-Python replica of the fixed-iteration rounded PageRank."""
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = sorted({s for s, _ in edges})
    n = float(len(nodes))
    deg = {s: float(sum(1 for e in edges if e[0] == s)) for s in nodes}
    r = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += r[s] / deg[s]
        r = {
            v: round((1 - damping) / n + damping * contrib[v], 9) for v in nodes
        }
    return r


def test_pagerank_matches_reference(spark):
    # triangle + pendant: 1-2, 2-3, 1-3, 3-4
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["r"] for r in pagerank(df).collect()}
    exp = _reference_pr(pairs, PR_DAMPING, PR_ITERS)
    assert got == exp
    # node 3 has the highest degree and must rank top; mass ~ conserved
    assert max(got, key=got.get) == 3
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert pagerank(df).count() == 0
