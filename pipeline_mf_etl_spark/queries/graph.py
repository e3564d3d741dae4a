"""Graph-analytics queries over the near-dup pair graph.

g1 ranks documents by PageRank over d2's verified MinHash pairs — the
curation signal for "boilerplate hubs" (a doc near-duplicating many
others sits central in the graph). The engine consumes the persisted
pair export (computed at most once per process+sf); the oracle
recomputes the pair chain in SQL (d6's convention) and unrolls the
FIXED five PageRank iterations as chained aggregating CTEs — DuckDB
disallows aggregates in a recursive term, and a fixed iteration count
needs no recursion anyway. Per-iteration 9-dp rounding on BOTH engines
stops accumulation-order drift from compounding; the (1-damping)
numerator is interpolated from the SAME Python double the engine uses
(DuckDB's own `1 - 0.85` evaluates in DECIMAL to exactly 0.15, a
~5e-17 divergence that could flip a 9-dp round on a boundary).

The global importance rank is computed with the distributed
total-order idiom (range repartition + per-partition row_number +
broadcast offsets, operators/graph.py:total_order_rank) — NEVER a
single-partition Window.orderBy, which would move the entire node set
(O(corpus) for boilerplate-heavy corpora, the very case g1 exists to
detect) onto one task. tests/test_plans.py guards the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.config import load_settings
from pipeline_mf_etl_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERS,
    pagerank,
    total_order_rank,
)
from pipeline_mf_etl_spark.queries.registry import query

#: cluster deployments flip graph.reliable_checkpoints in settings.yaml
#: (after setCheckpointDir to durable storage) — no code edit needed.
_RELIABLE = load_settings().graph.reliable_checkpoints

#: bit-identical numerator on both engines (see module docstring)
_BASE_NUM = repr(1 - PR_DAMPING)


def _g1_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _D2_CHAIN

    steps = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""r{k} AS (
        SELECT nd.node,
               ROUND(CAST({_BASE_NUM} AS DOUBLE) / (SELECT n FROM nn)
                     + {PR_DAMPING} * COALESCE(SUM(p.r / dg.deg), 0), 9) AS r
        FROM nodes nd
        LEFT JOIN edges e ON e.dst = nd.node
        LEFT JOIN {prev} p ON p.node = e.src
        LEFT JOIN deg dg ON dg.node = e.src
        GROUP BY nd.node
    )""")
        prev = f"r{k}"
    return f"""
    WITH {_D2_CHAIN},
    edges AS (
        SELECT a AS src, b AS dst FROM verified
        UNION ALL
        SELECT b AS src, a AS dst FROM verified
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS deg
            FROM edges GROUP BY src),
    r0 AS (SELECT node, ROUND(1.0 / (SELECT n FROM nn), 9) AS r FROM nodes),
    {", ".join(steps)}
    SELECT node AS doc_id,
           ROUND(r, 6) AS pagerank,
           CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node ASC) AS INTEGER) AS rank
    FROM {prev}
    """


@query("g1_pagerank_neardup", eager=True, oracle=_g1_oracle())
def g1_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 fixed iterations) over the verified
    near-dup pair graph; output every graph node with its 6-dp rank
    value and a global importance rank. EAGER: the engine consumes the
    persisted pair export and iterates join+agg rounds at build time.

    The total order is produced WITHOUT a single-partition exchange:
    range-repartition on (r desc, node) + per-partition row_number +
    broadcast partition offsets (the oracle's ROW_NUMBER is the
    semantic spec; the engine reproduces it distributedly)."""
    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    pairs = verified_pairs_export(spark, sf_dir).select("a", "b")
    ranks = pagerank(pairs, reliable=_RELIABLE)
    ranked = total_order_rank(
        ranks, [F.col("r").desc(), F.col("node").asc()], rank_name="rank"
    )
    return ranked.select(
        F.col("node").alias("doc_id"),
        F.round("r", 6).alias("pagerank"),
        F.col("rank").cast("int").alias("rank"),
    )


def _g2_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _D2_CHAIN

    steps = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""r{k} AS (
        SELECT nd.node,
               ROUND(CAST({_BASE_NUM} AS DOUBLE) / (SELECT n FROM nn)
                     + {PR_DAMPING} * COALESCE(SUM(p.r * e.w / dg.deg), 0), 9) AS r
        FROM nodes nd
        LEFT JOIN edges e ON e.dst = nd.node
        LEFT JOIN {prev} p ON p.node = e.src
        LEFT JOIN deg dg ON dg.node = e.src
        GROUP BY nd.node
    )""")
        prev = f"r{k}"
    return f"""
    WITH {_D2_CHAIN},
    edges AS (
        SELECT a AS src, b AS dst, jaccard AS w FROM verified
        UNION ALL
        SELECT b AS src, a AS dst, jaccard AS w FROM verified
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src AS node, SUM(w) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, ROUND(1.0 / (SELECT n FROM nn), 9) AS r FROM nodes),
    {", ".join(steps)}
    SELECT node AS doc_id,
           ROUND(r, 6) AS pagerank,
           CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node ASC) AS INTEGER) AS rank
    FROM {prev}
    """


@query("g2_pagerank_weighted", eager=True, oracle=_g2_oracle())
def g2_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-WEIGHTED PageRank over the verified near-dup graph: a doc
    distributes rank proportionally to pair similarity (w / Σ_out w), so
    tight duplicate hubs concentrate mass that uniform g1 spreads over
    incidental low-similarity links. Same plan shape and determinism
    regime as g1 (fixed rounds, per-iteration 9-dp rounding,
    distributed total-order rank)."""
    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    pairs = verified_pairs_export(spark, sf_dir).select("a", "b", "jaccard")
    ranks = pagerank(pairs, weight_col="jaccard", reliable=_RELIABLE)
    ranked = total_order_rank(
        ranks, [F.col("r").desc(), F.col("node").asc()], rank_name="rank"
    )
    return ranked.select(
        F.col("node").alias("doc_id"),
        F.round("r", 6).alias("pagerank"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# g3: triangle count + global clustering coefficient over the verified
# near-dup pair graph — the density diagnostic PageRank cannot give:
# template families show up as CLIQUES (every pair verifies), so a high
# triangle-to-wedge ratio says the duplicate mass is a few dense
# families rather than long chains, which changes the right canonical-
# retention strategy (d6 keeps one per family either way, but chains
# risk transitive drift; see d5/d6).
#
# Scale shape: the DEGREE-ORDERED node-iterator (Suri & Vassilvitskii's
# MR triangle counting, public) — orient every edge from its
# (degree, id)-smaller endpoint, build wedges by self-joining oriented
# edges on the source, close them with one more equi-join against the
# oriented edge set. Each triangle is counted exactly once (its
# lex-smallest vertex sources both wedge legs), and the wedge join's
# fan-out is Σ out-deg², bounded O(m^1.5) under degree orientation —
# hub nodes become SINKS, never wedge centers, so a boilerplate doc
# near-duplicating half the corpus cannot blow the join up. Equi-joins
# only; one-row output.
# ---------------------------------------------------------------------------
def _g3_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _D2_CHAIN

    return f"""
    WITH {_D2_CHAIN},
    und AS (SELECT a AS node FROM verified UNION ALL SELECT b FROM verified),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY node),
    oriented AS (
        SELECT CASE WHEN (da.deg, v.a) < (db.deg, v.b) THEN v.a ELSE v.b END AS u,
               CASE WHEN (da.deg, v.a) < (db.deg, v.b) THEN v.b ELSE v.a END AS v,
               CASE WHEN (da.deg, v.a) < (db.deg, v.b) THEN db.deg ELSE da.deg
                   END AS deg_v
        FROM verified v
        JOIN deg da ON da.node = v.a
        JOIN deg db ON db.node = v.b
    ),
    wedges AS (
        SELECT x.v AS p, y.v AS q
        FROM oriented x JOIN oriented y ON x.u = y.u
        WHERE (x.deg_v, x.v) < (y.deg_v, y.v)
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM wedges w JOIN oriented o ON o.u = w.p AND o.v = w.q
    ),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
        FROM deg
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM verified)
    SELECT base.n_nodes, ne.n_edges, base.n_wedges, tri.n_triangles,
           ROUND(CASE WHEN base.n_wedges > 0
                      THEN 3.0 * tri.n_triangles / base.n_wedges END, 6)
               AS clustering_coeff
    FROM base, ne, tri
    """


@query("g3_triangle_count", eager=True, oracle=_g3_oracle())
def g3_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count and global clustering coefficient
    (3·triangles / wedges) over the verified near-dup pair graph, via
    the degree-ordered node-iterator (equi-joins only, hub nodes are
    wedge SINKS — see the section comment). One-row output; the
    1-row×1-row combining joins are broadcast by construction."""
    from pipeline_mf_etl_spark.operators.graph import triangle_stats
    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    pairs = verified_pairs_export(spark, sf_dir).select("a", "b")
    return triangle_stats(pairs)
