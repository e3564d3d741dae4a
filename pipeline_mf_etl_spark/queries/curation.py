"""The d7 curation-waterfall query: the end-to-end corpus-curation
report (``corpus_curate.py``) as an oracle-certified one-row frame.

The oracle replays the ENTIRE waterfall in SQL by composing the exact
certified fragments of its stages — d1's fingerprint expression, the
``d2_chain``/``neardup_ranked_ctes`` builders parameterized over the
exact-dedupe survivors, and the full t2/t7/t8 oracle SELECTs as
subqueries — so the pipeline's stage composition (not just each stage
in isolation) is hash-checked against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipeline_mf_etl_spark.queries.registry import query


def _d7_oracle() -> str:
    from pipeline_mf_etl_spark.corpus_curate import DEFAULT_QUALITY_MIN
    from pipeline_mf_etl_spark.queries.dedup import (
        EXACT_FP_SQL,
        d2_chain,
        neardup_ranked_ctes,
    )
    from pipeline_mf_etl_spark.queries.text import T2_SQL, T7_SQL, T8_SQL

    waterfall = []
    not_before = "TRUE"
    for n in ("exact", "near", "quality", "repetition", "contamination"):
        waterfall.append(
            f"CAST(SUM(CASE WHEN {not_before} AND f_{n} THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS dropped_{n}"
        )
        not_before = f"{not_before} AND NOT f_{n}"
    return f"""
    WITH RECURSIVE exact_fp AS (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY {EXACT_FP_SQL}) AS keeper
        FROM documents
    ), exact_drop AS (
        SELECT doc_id FROM exact_fp WHERE doc_id <> keeper
    ), base AS (
        SELECT d.* FROM documents d
        LEFT JOIN exact_drop e USING (doc_id)
        WHERE e.doc_id IS NULL
    ),
    {d2_chain("base")},
    {neardup_ranked_ctes("base")},
    near_drop AS (SELECT doc_id FROM ranked WHERE rk > 1),
    lowq AS (SELECT doc_id FROM ({T2_SQL}) WHERE quality < {DEFAULT_QUALITY_MIN!r}),
    rep AS (SELECT doc_id FROM ({T7_SQL}) WHERE is_repetitive),
    contam AS (SELECT doc_id FROM ({T8_SQL}) WHERE contaminated),
    decision AS (
        SELECT d.doc_id,
               e.doc_id IS NOT NULL AS f_exact,
               n.doc_id IS NOT NULL AS f_near,
               q.doc_id IS NOT NULL AS f_quality,
               r.doc_id IS NOT NULL AS f_repetition,
               c.doc_id IS NOT NULL AS f_contamination
        FROM documents d
        LEFT JOIN exact_drop e USING (doc_id)
        LEFT JOIN near_drop n USING (doc_id)
        LEFT JOIN lowq q USING (doc_id)
        LEFT JOIN rep r USING (doc_id)
        LEFT JOIN contam c USING (doc_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
           {", ".join(waterfall)},
           CAST(SUM(CASE WHEN {not_before} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained
    FROM decision
    """


@query("d7_curation_waterfall", eager=True, oracle=_d7_oracle())
def d7_curation_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row curation report: input count, first-rejecting-stage drop
    attribution across the five-stage waterfall (exact dedupe → near-dup
    retention on exact survivors → quality floor → repetition →
    contamination), survivor count — the exact aggregation
    ``curate_corpus`` writes to ``curation_report.json``, certified
    end-to-end against the SQL replay of the whole pipeline. EAGER: the
    near stage's connected components iterates at build time."""
    from pipeline_mf_etl_spark.corpus_curate import (
        curation_decision_frame,
        waterfall_counts,
    )

    return waterfall_counts(curation_decision_frame(spark, sf_dir))
