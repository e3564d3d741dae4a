"""Lexical (BM25) + hybrid (RRF) retrieval queries over the documents
and embeddings tables.

The dense half of hybrid retrieval is the ANN family
(queries/similarity.py); r1 adds the sparse half and r2 fuses the two
with reciprocal-rank fusion. Oracles replay the exact computations in
SQL with the shared corpus tokenizer (queries/text.py:_TOKS), ranking
on 6-dp-rounded scores with a doc_id tie-break — the same cross-engine
ordering convention as the ANN queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    RRF_C,
    bm25_topk,
    rrf_fuse,
)
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.queries.text import _TOKS
from pipeline_mf_etl_spark.sources.readers import fan_out, load_table

# fixed retrieval workload: clean lowercase single-space strings, so the
# shared tokenizer yields exactly these words on both engines. The
# hybrid (r2) workload pairs query_id q with the embedding of
# vec_id = q - 1 as its dense example vector (vec_id and doc_id are the
# same id space in the testdata).
_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark window join"),
    (2, "hash scan merge stream"),
    (3, "customer filter query"),
    (4, "vector batch group"),
)

_Q_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, text in _QUERIES for term in dict.fromkeys(text.split())
)

# Shared Okapi BM25 CTE chain (ends at sparse_ranked: one row per
# (query, doc) with score + rank). r1 consumes it directly; r2's fusion
# oracle composes it with the dense cosine chain.
_BM25_CTES = f"""
    tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, UNNEST(toks) AS term FROM tok),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    a AS (SELECT SUM(dl) * 1.0 / (SELECT n_docs FROM s) AS avgdl FROM dl),
    q AS (SELECT CAST(qid AS BIGINT) AS query_id, term
          FROM (VALUES {_Q_VALUES}) v(qid, term)),
    dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
            FROM tf WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    sparse_scored AS (
        SELECT q.query_id, tf.doc_id,
               ROUND(SUM(
                   ln(1 + ((SELECT n_docs FROM s) - dfq.df + 0.5) / (dfq.df + 0.5))
                   * (tf.tf * ({BM25_K1} + 1))
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl
                                           / (SELECT avgdl FROM a)))
               ), 6) AS score
        FROM q
        JOIN tf USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN dfq ON dfq.term = q.term
        GROUP BY 1, 2
    ),
    sparse_ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        FROM sparse_scored
    )"""


@query(
    "r1_bm25_topk",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, score, CAST(rank AS INTEGER) AS rank
    FROM sparse_ranked WHERE rank <= 5
    """,
)
def r1_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 docs for a fixed 4-query lexical workload
    (operators/retrieval.py:bm25_topk — broadcast query-term semi-join
    over one-shuffle inverted-index postings). fan_out (r14): the
    postings tokenize+explode is the heavy map side and the driver's
    single-row-group documents file pins it to one core (no-op at
    production split counts)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    queries = spark.createDataFrame(list(_QUERIES), "query_id long, qtext string")
    return bm25_topk(docs, queries, k=5)


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@query(
    "r2_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    dq AS (SELECT vec_id + 1 AS query_id, vec_id AS qvec, emb AS qv
           FROM v WHERE vec_id < 4),
    dense_scored AS (
        SELECT dq.query_id, c.vec_id AS doc_id,
               ROUND({_COS.format(a="dq.qv", b="c.emb")}, 6) AS cos
        FROM dq JOIN v c ON c.vec_id <> dq.qvec
    ),
    dense_ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, doc_id ASC) AS rank
        FROM dense_scored
    ),
    sp AS (SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank
           FROM sparse_ranked WHERE rank <= 20),
    de AS (SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank
           FROM dense_ranked WHERE rank <= 20),
    fused AS (
        SELECT COALESCE(sp.query_id, de.query_id) AS query_id,
               COALESCE(sp.doc_id, de.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({RRF_C} + sp.rank), 0)
                     + COALESCE(1.0 / ({RRF_C} + de.rank), 0), 6) AS rrf,
               sp.rank AS rank_sparse,
               de.rank AS rank_dense
        FROM sp FULL OUTER JOIN de
          ON sp.query_id = de.query_id AND sp.doc_id = de.doc_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rank
        FROM fused
    )
    SELECT query_id, doc_id, rrf, rank_sparse, rank_dense,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def r2_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (text queries) and brute-force
    cosine top-20 (each query's paired example vector, self excluded)
    fused by reciprocal rank — rrf = Σ 1/(60 + rank_modality) — top-10
    per query. Rank-based fusion needs no score calibration and is
    exactly reproducible across engines (ranks are small ints on both
    sides of the oracle)."""
    from pipeline_mf_etl_spark.operators.similarity import brute_force_topk

    docs = fan_out(load_table(spark, sf_dir, "documents"))  # fan_out: r14, see r1
    queries = spark.createDataFrame(list(_QUERIES), "query_id long, qtext string")
    sparse = bm25_topk(docs, queries, k=20)

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dense = (
        brute_force_topk(v.filter(F.col("vec_id") < 4), v, k=20)
        .withColumn("query_id", F.col("query_id") + 1)
        .select("query_id", F.col("cand_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(sparse, dense, k=10)
