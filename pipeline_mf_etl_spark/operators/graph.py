"""Graph analytics over pair graphs (the near-dup graph family).

Connected components lives in operators/dedupe.py (min-label
propagation); this module adds PageRank — the standard importance
measure over the same (a, b) pair graphs, used in curation to rank
documents by how centrally they sit in a duplication/similarity
neighborhood (a hub of near-dups is usually boilerplate).

Scale shape: each iteration is one equi-join (edges ⋈ ranks on src)
plus one groupBy(dst) — the GraphX/Pregel shuffle pattern. The
iteration count is FIXED (a hyperparameter, not data-driven), so the
job count is constant at any corpus size. Loop-carried frames are
localCheckpoint'ed per round so the analyzed plan stays constant-size
(same rationale as connected_components).

Cross-engine determinism: ranks are rounded to 9 dp after EVERY
iteration on both engines, so accumulation-order ulp drift cannot
compound across rounds — the same convention as the EWM/flow oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 5


def pagerank(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair graph (each pair contributes
    both directed edges, so every node has out-degree ≥ 1 — no dangling
    mass). Returns (node, r) with r rounded to 9 dp.

    ``weight_col`` (optional): edge weights — a node then distributes
    its rank proportionally to each outgoing weight (w / Σ_out w)
    instead of uniformly; the plan shape is identical (the degree
    aggregate becomes a weight-sum aggregate).

    Ranks are normalized over the nodes that appear in ``edges``
    (isolated docs never enter the graph and keep no rank).
    """
    cols = [F.col(a_col).alias("src"), F.col(b_col).alias("dst")]
    rcols = [F.col(b_col).alias("src"), F.col(a_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("w"))
        rcols.append(F.col(weight_col).cast("double").alias("w"))
    sym = edges.select(*cols).unionAll(edges.select(*rcols)).localCheckpoint()
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("r", F.lit(0.0))
    wexpr = F.sum("w") if weight_col is not None else F.count("*").cast("double")
    deg = sym.groupBy("src").agg(wexpr.alias("deg")).localCheckpoint()
    # float-expression parity with the SQL oracles: unweighted is
    # EXACTLY r/deg; weighted is EXACTLY r*w/deg (same literal forms)
    if weight_col is not None:
        contrib_term = F.col("r") * F.col("w") / F.col("deg")
    else:
        contrib_term = F.col("r") / F.col("deg")
    base = (1 - damping) / float(n)  # IEEE double, same arithmetic as the SQL twin
    ranks = nodes.select("node", F.round(F.lit(1.0 / float(n)), 9).alias("r"))
    for _ in range(iters):
        contrib = (
            sym.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(contrib_term).alias("c"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + damping * F.coalesce(F.col("c"), F.lit(0.0)), 9
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks
