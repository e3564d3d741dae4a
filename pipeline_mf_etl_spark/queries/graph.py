"""Graph-analytics queries over the near-dup pair graph.

g1 ranks documents by PageRank over d2's verified MinHash pairs — the
curation signal for "boilerplate hubs" (a doc near-duplicating many
others sits central in the graph). The engine consumes the persisted
pair export (computed at most once per process+sf); the oracle
recomputes the pair chain in SQL (d6's convention) and unrolls the
FIXED five PageRank iterations as chained aggregating CTEs — DuckDB
disallows aggregates in a recursive term, and a fixed iteration count
needs no recursion anyway. Per-iteration 9-dp rounding on BOTH engines
stops accumulation-order drift from compounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.graph import PR_DAMPING, PR_ITERS, pagerank
from pipeline_mf_etl_spark.queries.registry import query


def _g1_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _D2_CHAIN

    steps = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""r{k} AS (
        SELECT nd.node,
               ROUND((1 - {PR_DAMPING}) / (SELECT n FROM nn)
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

    The final unpartitioned row_number is a PRESENTATION rank over the
    near-dup-member node set (a small fraction of the corpus); a
    100-TB consumer wanting the full ordering should take the
    (doc_id, pagerank) pairs and sort/top-k at the sink instead of
    forcing a single-partition global rank."""
    from pyspark.sql import Window

    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    pairs = verified_pairs_export(spark, sf_dir).select("a", "b")
    ranks = pagerank(pairs)
    w = Window.orderBy(F.col("r").desc(), F.col("node").asc())
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round("r", 6).alias("pagerank"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def _g2_oracle() -> str:
    from pipeline_mf_etl_spark.queries.dedup import _D2_CHAIN

    steps = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""r{k} AS (
        SELECT nd.node,
               ROUND((1 - {PR_DAMPING}) / (SELECT n FROM nn)
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
    regime as g1 (fixed rounds, per-iteration 9-dp rounding)."""
    from pyspark.sql import Window

    from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

    pairs = verified_pairs_export(spark, sf_dir).select("a", "b", "jaccard")
    ranks = pagerank(pairs, weight_col="jaccard")
    w = Window.orderBy(F.col("r").desc(), F.col("node").asc())
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.round("r", 6).alias("pagerank"),
        F.row_number().over(w).cast("int").alias("rank"),
    )
