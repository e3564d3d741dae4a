"""URL-layer curation queries (t16 canonicalize, d12 per-domain
rollup) — the CommonCrawl stage between WARC ingestion (c1) and
source-level gating (t10), over operators/url.py.

Synthesis builds one hostile URL per document with pure JVM concat
(mixed-case scheme/host, default and non-default ports, duplicate
slashes, trailing-slash and fragment cycling, tracking params mixed
into real ones) — every canonicalization rule carries hash signal on
every corpus pass. The oracle reconstructs the EXPECTED canonical form
by independent arithmetic on doc_id (not by re-running the
canonicalizer), so the regex chain is certified against a second
implementation, not against itself.

Plan shapes: t16 is a map-only projection (zero Python, zero
shuffles); d12 adds exactly ONE hash exchange (the domain groupBy with
partial aggregation map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.url import url_canonical_columns
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# hostile-URL synthesis (JVM concat; moduli keep the canonical form
# collision-prone so d12's dedup counts are non-trivial)
# ---------------------------------------------------------------------------


def hostile_url_column(doc_id: Column) -> Column:
    scheme = (
        F.when(doc_id % 4 == 0, "HTTP")
        .when(doc_id % 4 == 1, "https")
        .when(doc_id % 4 == 2, "HTTPS")
        .otherwise("http")
    )
    port = (
        F.when(doc_id % 5 == 0, ":80")
        .when(doc_id % 5 == 1, ":443")
        .when(doc_id % 5 == 2, ":8080")
        .otherwise("")
    )
    q = (
        F.when(
            doc_id % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&id="),
                (doc_id % 10).cast("string"),
                F.lit("&utm_medium=x"),
            ),
        )
        .when(doc_id % 3 == 1, F.concat(F.lit("?id="), (doc_id % 10).cast("string")))
        .otherwise("?fbclid=abc")
    )
    return F.concat(
        scheme,
        F.lit("://WWW.Example-"),
        (doc_id % 50).cast("string"),
        F.lit(".COM"),
        port,
        F.lit("/Docs//"),
        (doc_id % 20).cast("string"),
        F.when(doc_id % 2 == 0, "/").otherwise(""),
        q,
        F.when(doc_id % 2 == 1, "#Section-2").otherwise(""),
    )


#: the oracle's independent reconstruction of the canonical form
_SCHEME_SQL = "CASE WHEN doc_id % 4 IN (0, 3) THEN 'http' ELSE 'https' END"
_PORT_SQL = """CASE WHEN doc_id % 5 = 0 AND doc_id % 4 IN (1, 2) THEN ':80'
         WHEN doc_id % 5 = 1 AND doc_id % 4 IN (0, 3) THEN ':443'
         WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END"""
_CANON_SQL = f"""({_SCHEME_SQL} || '://www.example-' || (doc_id % 50) || '.com'
     || {_PORT_SQL} || '/Docs/' || (doc_id % 20)
     || CASE WHEN doc_id % 3 IN (0, 1)
             THEN '?id=' || (doc_id % 10) ELSE '' END)"""
_DOMAIN_SQL = "('example-' || (doc_id % 50) || '.com')"


def _canonical_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    url = hostile_url_column(F.col("doc_id"))
    cols = url_canonical_columns(url)
    return docs.select(
        "doc_id", *(v.alias(k) for k, v in cols.items())
    )


@query(
    "t16_url_canonicalize",
    oracle=f"""
    SELECT doc_id,
           {_CANON_SQL} AS canon_url,
           {_DOMAIN_SQL} AS domain,
           {_SCHEME_SQL} AS scheme,
           doc_id % 2 = 1 AS had_fragment,
           doc_id % 3 IN (0, 2) AS had_tracking,
           CAST(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0 END AS BIGINT)
               AS n_params_kept
    FROM documents
    """,
)
def t16_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize one hostile URL per document: fragment drop,
    scheme/host lowercasing, default-port strip (scheme-aware —
    https://h:80 keeps its port), duplicate-slash collapse,
    trailing-slash policy, tracking-param strip with order-preserving
    keeps, registrable-domain extraction. Map-only, zero Python; the
    oracle reconstructs every output by independent doc_id arithmetic."""
    return _canonical_frame(spark, sf_dir)


@query(
    "d12_url_domain_rollup",
    oracle=f"""
    WITH c AS (
        SELECT doc_id,
               {_CANON_SQL} AS canon_url,
               {_DOMAIN_SQL} AS domain,
               doc_id % 3 IN (0, 2) AS had_tracking
        FROM documents
    )
    SELECT domain,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT canon_url) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT canon_url) AS n_dups,
           CAST(SUM(CASE WHEN had_tracking THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tracking
    FROM c GROUP BY domain
    """,
)
def d12_url_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL dedup accounting over the canonical forms: raw
    vs distinct counts (the canonicalizer's value is exactly this gap)
    and tracking-param prevalence. ONE hash exchange; count(distinct)
    stays single-pass because it is the only distinct aggregate."""
    c = _canonical_frame(spark, sf_dir)
    return c.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("canon_url").alias("n_distinct"),
        (F.count("*") - F.countDistinct("canon_url")).alias("n_dups"),
        F.sum(F.col("had_tracking").cast("long")).alias("n_tracking"),
    )
