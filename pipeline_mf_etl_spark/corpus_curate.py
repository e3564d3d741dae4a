"""End-to-end corpus curation: the cleaning pipeline a training-data
team runs before a corpus is mixed and tokenized, composed from the
engine's certified per-signal queries:

1. exact dedupe       — d1 semantics: one keeper (min doc_id) per
                        normalized-token-set fingerprint
2. near-dup retention — d6 semantics: MinHash pairs → connected
                        components → keep the best-quality doc per
                        cluster, drop the rest
3. quality floor      — t2 composite score >= ``quality_min``
4. repetition filter  — t7 ``is_repetitive`` flag
5. contamination gate — t8 ``contaminated`` flag (benchmark 13-gram
                        overlap)

Every drop is attributed to the FIRST stage that rejects it (waterfall
counts, one aggregation), survivors are written as ``documents.parquet``
so the curated output is itself a valid corpus directory — re-running
curation on its own output must drop ~nothing (idempotence is a pytest,
tests/test_curate.py).

Scale shape: each signal is the already-plan-audited query (one scan +
bounded shuffles each); the decision frame joins them on doc_id — five
hash joins on the id — and ONE aggregation produces the whole report.
Nothing here adds a driver loop or a new shuffle beyond the signal
queries themselves.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.sources.readers import load_table
from pipeline_mf_etl_spark.sources.writers import write_json_artifact

from pipeline_mf_etl_spark.operators.text import QUALITY_ADMIT_MIN

DEFAULT_QUALITY_MIN = QUALITY_ADMIT_MIN

#: waterfall stage order — drops are attributed to the FIRST rejecting
#: stage, in this order (shared by curate_corpus and the d7 query)
STAGES = ("exact", "near", "quality", "repetition", "contamination")


def curation_decision_frame(
    spark: SparkSession, sf_dir: str, quality_min: float = DEFAULT_QUALITY_MIN
) -> DataFrame:
    """Per-document drop flags (doc_id, f_exact, f_near, f_quality,
    f_repetition, f_contamination) — one row per input doc, each flag
    from its certified signal expressions. EAGER: the near stage's
    connected components iterates join+count rounds when called.

    Plan shape (r14 rewrite — guide §2.3 "scan once, shuffle narrow"):
    quality (t2) and repetition (t7) are per-row functions of
    (text, toks) and the exact flag is a window over the d1
    fingerprint, so ONE corpus scan computes all three — the scan
    projects down to (doc_id, fingerprint, f_quality, f_repetition)
    BEFORE the fingerprint exchange, so neither text nor the token
    array ever crosses a shuffle. Only contamination (t8 — a gram
    explode + groupBy) and the near stage (pair restriction + CC)
    remain separate branches, attached by two left joins instead of
    the previous five. Flag values are bit-identical to the standalone
    queries': the expressions are imported from the same single
    sources (rounded_quality, repetition_raw_signals/repetition_flag,
    exact_fingerprint_from_tokens)."""
    from pipeline_mf_etl_spark.operators.dedupe import (
        exact_fingerprint_from_tokens,
        tokens,
    )
    from pipeline_mf_etl_spark.operators.text import rounded_quality
    from pipeline_mf_etl_spark.queries.dedup import (
        ranked_neardup_clusters,
        verified_pairs_export,
    )
    from pipeline_mf_etl_spark.queries.text import (
        repetition_flag,
        repetition_raw_signals,
        t8_contamination,
    )

    from pipeline_mf_etl_spark.sources.readers import fan_out

    docs = load_table(spark, sf_dir, "documents")

    # fan_out (r14): the signal scan's tokenize + bigram HOF work vs the
    # driver's single-row-group documents file (no-op at production
    # splits). The near/contam branches and the cluster ranking join the
    # UNfanned docs frame — their doc scans are join/explode-shuffled
    # anyway.
    base = fan_out(docs).select(
        "doc_id", "text", tokens(F.col("text")).alias("toks")
    )
    pre = base.select(
        "doc_id",
        exact_fingerprint_from_tokens(F.col("toks")).alias("fingerprint"),
        (rounded_quality(F.col("text"), F.col("toks")) < quality_min).alias(
            "f_quality"
        ),
        "toks",
    )
    sig = repetition_raw_signals(pre).select(
        "doc_id", "fingerprint", "f_quality", repetition_flag().alias("f_repetition")
    )
    # exact flag as a window over the fingerprint: doc_id is the keeper
    # of its fingerprint group iff it is the group minimum (d1
    # semantics) — computed on the already-narrow signal frame, no
    # join-back needed.
    flagged = sig.select(
        "doc_id",
        "f_quality",
        "f_repetition",
        (
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy("fingerprint"))
        ).alias("f_exact"),
    )

    flag = F.lit(True).alias("f")
    # near-dup clustering runs on the EXACT-stage survivors: a cluster
    # whose best-quality canonical happens to be an exact-dup non-keeper
    # (same token set, different raw text) would otherwise lose every
    # member — the canonical to the exact stage, the rest to this one.
    # The pair graph comes from the shared raw-corpus export: MinHash
    # signatures, band buckets and pair Jaccard are all PER-DOC/PER-PAIR
    # quantities, so the survivor subset's pair graph is exactly the
    # raw pair set restricted to pairs with BOTH endpoints surviving —
    # two doc_id equi-joins replace recomputing the whole MinHash chain
    # (the most expensive subplan in the family) inside the waterfall.
    # CC nodes are pair endpoints ⊆ survivors, so the cluster ranking
    # can join the FULL docs frame (no anti-join scan): member rows and
    # quality values are identical either way.
    surv = flagged.filter(~F.col("f_exact")).select("doc_id")
    pairs = (
        verified_pairs_export(spark, sf_dir)
        .select("a", "b")
        .join(surv.select(F.col("doc_id").alias("a")), "a")
        .join(surv.select(F.col("doc_id").alias("b")), "b")
    )
    near = (
        ranked_neardup_clusters(docs, pairs=pairs)
        .filter(F.col("rk") > 1)
        .select("doc_id", flag.alias("f_near"))
    )
    contam = (
        t8_contamination(spark, sf_dir)
        .filter(F.col("contaminated"))
        .select("doc_id", flag.alias("f_contamination"))
    )

    return (
        flagged.join(near, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            "f_exact",
            F.coalesce("f_near", F.lit(False)).alias("f_near"),
            "f_quality",
            "f_repetition",
            F.coalesce("f_contamination", F.lit(False)).alias("f_contamination"),
        )
    )


def waterfall_counts(decision: DataFrame) -> DataFrame:
    """ONE aggregation over the decision frame: input count, per-stage
    first-rejecting-stage drop attribution, survivor count."""
    not_before = F.lit(True)
    attributed = []
    for n in STAGES:
        # coalesce: SUM over zero rows is NULL — an empty corpus must
        # report zeros, not crash the int() casts in the report
        attributed.append(
            F.coalesce(
                F.sum((not_before & F.col(f"f_{n}")).cast("long")), F.lit(0)
            ).alias(f"dropped_{n}")
        )
        not_before = not_before & ~F.col(f"f_{n}")
    return decision.agg(
        F.count("*").alias("n_input"),
        *attributed,
        F.coalesce(F.sum(not_before.cast("long")), F.lit(0)).alias("n_retained"),
    )


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    output_path: str,
    quality_min: float = DEFAULT_QUALITY_MIN,
) -> dict[str, Any]:
    """Run the five-stage curation waterfall over ``sf_dir``'s documents
    table; write survivors to ``<output_path>/documents.parquet`` and a
    JSON report to ``<output_path>/curation_report.json``. Returns the
    report dict."""
    docs = load_table(spark, sf_dir, "documents")
    decision = curation_decision_frame(spark, sf_dir, quality_min).persist()
    counts = waterfall_counts(decision).collect()[0]

    any_drop = F.col("f_exact")
    for n in STAGES[1:]:
        any_drop = any_drop | F.col(f"f_{n}")
    survivor_ids = decision.filter(~any_drop).select("doc_id")
    curated = docs.join(survivor_ids, "doc_id")
    out_parquet = os.path.join(output_path, "documents.parquet")
    curated.write.mode("overwrite").parquet(out_parquet)
    decision.unpersist()

    report: dict[str, Any] = {
        "input_dir": sf_dir,
        "output": out_parquet,
        "quality_min": quality_min,
        "n_input": int(counts["n_input"]),
        "n_retained": int(counts["n_retained"]),
        "retention_rate": round(
            counts["n_retained"] / counts["n_input"], 6
        )
        if counts["n_input"]
        else None,
        "dropped": {n: int(counts[f"dropped_{n}"]) for n in STAGES},
    }
    assert report["n_retained"] + sum(report["dropped"].values()) == report["n_input"]
    write_json_artifact(report, os.path.join(output_path, "curation_report.json"))
    return report
