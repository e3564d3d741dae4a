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


def test_total_order_rank_matches_global_window(spark):
    """Distributed rank must equal the single-partition ROW_NUMBER spec."""
    import pyspark.sql.functions as F

    from pipeline_mf_etl_spark.operators.graph import total_order_rank

    rows = [(i, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "node long, r double")
    got = {
        row["node"]: row["rank"]
        for row in total_order_rank(
            df, [F.col("r").desc(), F.col("node").asc()], num_partitions=7
        ).collect()
    }
    exp = {
        node: i + 1
        for i, (node, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == exp


def test_total_order_rank_no_single_partition_exchange(spark):
    """The rank plan must contain NO `Exchange SinglePartition` (the
    unpartitioned-WindowExec shape that moves the whole set to one
    task)."""
    import pyspark.sql.functions as F

    from pipeline_mf_etl_spark.operators.graph import total_order_rank

    df = spark.range(1000).select(
        F.col("id").alias("node"), (F.col("id") % 13).cast("double").alias("r")
    )
    ranked = total_order_rank(df, [F.col("r").desc(), F.col("node").asc()])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan, plan  # rank still computed via a window...
    # ...but every Window is partitioned (fed by hashpartitioning on _pid)


def test_pagerank_reliable_checkpoint(spark, tmp_path):
    """reliable=True must produce identical ranks through fault-tolerant
    checkpoints (cluster path for hour-10 executor-loss survival)."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame(pairs, "a long, b long")
    base = {r["node"]: r["r"] for r in pagerank(df).collect()}
    rel = {r["node"]: r["r"] for r in pagerank(df, reliable=True).collect()}
    assert base == rel


def test_triangle_stats_planted_graphs(spark):
    """Hand-computable graphs: a 4-clique (4 triangles, gcc=1), a
    4-path (0 triangles), and a clique+pendant mix where the wedge
    count includes the open wedges the pendant creates."""
    from pipeline_mf_etl_spark.operators.graph import triangle_stats

    def stats(edges):
        df = spark.createDataFrame(edges, "a long, b long")
        return triangle_stats(df).collect()[0]

    # 4-clique: C(4,3)=4 triangles, 4 nodes with deg 3 -> 12 wedges
    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    r = stats(clique)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 6, 12, 4)
    assert r["clustering_coeff"] == 1.0

    # path 0-1-2-3: no triangles, two interior deg-2 nodes -> 2 wedges
    r = stats([(0, 1), (1, 2), (2, 3)])
    assert (r["n_triangles"], r["n_wedges"]) == (0, 2)
    assert r["clustering_coeff"] == 0.0

    # triangle + pendant on node 0: 1 triangle; degs = [3,2,2,1]
    # wedges = 3+1+1+0 = 5; gcc = 3/5
    r = stats([(0, 1), (0, 2), (1, 2), (0, 3)])
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 4, 5, 1)
    assert r["clustering_coeff"] == 0.6

    # two disjoint triangles sharing no nodes: exactly 2, never double-counted
    r = stats([(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)])
    assert r["n_triangles"] == 2 and r["clustering_coeff"] == 1.0
