"""Lexical (BM25) retrieval queries over the documents table.

The dense half of hybrid retrieval is the ANN family
(queries/similarity.py); this is the sparse half. The oracle replays
the exact Okapi BM25 computation in SQL with the shared corpus
tokenizer (queries/text.py:_TOKS), ranking on the 6-dp-rounded score
with a doc_id tie-break — the same cross-engine ordering convention as
the ANN queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipeline_mf_etl_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.queries.text import _TOKS
from pipeline_mf_etl_spark.sources.readers import load_table

# fixed retrieval workload: clean lowercase single-space strings, so the
# shared tokenizer yields exactly these words on both engines
_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark window join"),
    (2, "hash scan merge stream"),
    (3, "customer filter query"),
    (4, "vector batch group"),
)

_Q_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, text in _QUERIES for term in dict.fromkeys(text.split())
)


@query(
    "r1_bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, UNNEST(toks) AS term FROM tok),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    a AS (SELECT SUM(dl) * 1.0 / (SELECT n_docs FROM s) AS avgdl FROM dl),
    q AS (SELECT CAST(qid AS BIGINT) AS query_id, term
          FROM (VALUES {_Q_VALUES}) v(qid, term)),
    dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
            FROM tf WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    scored AS (
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
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, doc_id, score, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def r1_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 docs for a fixed 4-query lexical workload
    (operators/retrieval.py:bm25_topk — broadcast query-term semi-join
    over one-shuffle inverted-index postings)."""
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(list(_QUERIES), "query_id long, qtext string")
    return bm25_topk(docs, queries, k=5)
