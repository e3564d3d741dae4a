#!/usr/bin/env python
"""Scale probe: does runtime grow ~linearly with data volume?

Correctness runs at sf0.01 and the bench at sf0.1 — small enough that
fixed job overhead dominates. This probe replicates the sf0.1 events /
documents tables N× (remapping series/doc keys so cardinality scales
with volume, as it would in production) and times representative
operators at 1×, 4×, and 16×. A scale-sound plan shows near-linear
wall-clock growth; a super-linear blow-up flags a shuffle or join that
would fall over on a real cluster.

Writes replicated parquet under .scratch/ (gitignored). Usage:

    python scripts/scale_probe.py            # 1x, 4x, 16x
    python scripts/scale_probe.py 1 8        # custom multiples
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_mf_etl_spark.queries import all_queries  # noqa: E402
from pipeline_mf_etl_spark.session import get_spark  # noqa: E402
from pipeline_mf_etl_spark.sources.readers import load_table  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

# Operators spanning the families with non-trivial physical plans:
# window stack (one shuffle), run-length (two windows), MinHash+LSH
# (explode + self-join + verify), per-series Python island, and the
# sketch + per-partition-top-k candidate pass (whose whole point is
# staying linear as the key space grows).
PROBE = (
    "w2_rolling_stats",
    "w6_run_length",
    "d2_minhash_lsh",
    "w3_ewm_wilder",
    "a17_heavy_hitters",
    # round-4 additions: the sequential-island simulation (scales on
    # series count) and the 4-RMA viewer panel (one mapInPandas pass +
    # one shuffle for all window algebra)
    "b6_trade_sim",
    "v1_tmf_tti_panel",
    # LLM-pipeline family over replicated documents/embeddings: exact
    # dedupe (fingerprint groupBy), text quality (token-array algebra),
    # bucketed + IVF ANN (equi-join candidates, map-only assignment)
    "d1_exact_dedupe",
    "t2_quality_score",
    "e2_ann_bucketed",
    "e4_ann_ivf",
    # round-4 late additions: the trigram-LM scorer (explode + broadcast
    # model) and the canonical-doc retention step (MinHash pairs → CC →
    # quality arg-max; rounds scale with cluster diameter, not corpus)
    "t9_trigram_lm",
    "d6_canonical_docs",
    # PQ family: map-only encode + broadcast-LUT ADC (e5 scores the
    # whole corpus, e6 only the probed lists — e6's growth should sit
    # clearly below e5's)
    "e5_ann_pq",
    "e6_ann_ivfpq",
    # round-5 additions: the shuffle-free t7 rewrite (run-length HOF,
    # zero exchanges), next-fit sequence packing (one bucket shuffle +
    # per-bucket islands), and the Y4M decode+frame-sample map pass
    "t7_repetition_quality",
    "o12_sequence_packing",
    "mm6_video_decode",
    # round-5 late additions: the map-only Gopher rule battery and
    # chunker (both should scale like a scan), and semantic dedup
    # (O(N²/k) within-cell verify; replication inflates within-cell
    # pair OUTPUT the same way it inflates d2's — see SCALE.md)
    "t11_gopher_rules",
    "o14_chunk_windows",
    "e7_semantic_dedup",
    # round-5 late additions: BM25 (postings groupBy + broadcast query
    # semi-join — index build dominates, scoring is corpus-independent
    # per query), hybrid fusion (adds a fixed-size brute-force dense leg
    # over the replicated embeddings — linear in corpus), PCA (one
    # Gram-partial pass + map-only projection), shard shuffle (map-only
    # assignment + N-way partition sort), and the batch form of the
    # stream-stream attribution join (per-user interval join: key-space
    # remapping keeps pairs-per-user constant, so growth is linear)
    "r1_bm25_topk",
    "r2_hybrid_rrf",
    "e8_pca_project",
    "o15_shard_shuffle",
    "st9_attribution_join",
    # PageRank: fixed join+agg rounds over the verified-pair graph
    # (graph size scales with the corpus; round count does not) and the
    # BPE pipeline (one word-count groupBy + driver merge loop +
    # broadcast encode join)
    "g1_pagerank_neardup",
    "t12_bpe_tokenize",
    # map-shaped late additions (decode+pool passes / single-shuffle)
    "mm9_image_resize",
    "mm10_audio_downsample",
    "w19_time_decay_score",
    "o16_per_group_sample",
    "w20_rolling_autocorr",
    "g2_pagerank_weighted",
)


_UNIQUE_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
_UNIQUE_VOWELS = "aeiou"
_UNIQUE_CONS = "bcdfghjklm"  # structural subset, disjoint from vowels


def unique_mapping(k: int) -> str:
    """Letter permutation for UNIQUE-mode copy k: a full rotation
    (k % 26) composed with TWO disjoint slot cycles driven by k // 26 —
    the 5 vowel slots (period 5) and a 10-consonant subset (period 10).
    Same-rotation pairs (k, k+26g) therefore differ on >= 10 of 26
    letters (test_scale_probe_mapping), not just the 5 vowel slots the
    r8 version moved. A word avoiding all 15 slot letters still
    translates identically across same-rotation copies; with 15/26 of
    the alphabet cycling, that residue is negligible. 26*lcm(5,10)=260
    distinct mappings."""
    lo = _UNIQUE_ALPHABET
    r, g = k % 26, k // 26
    s, s2 = g % 5, g % 10
    rot = lo[r:] + lo[:r]
    out = list(rot)
    vpos = [i for i, ch in enumerate(rot) if ch in _UNIQUE_VOWELS]
    for j, i in enumerate(vpos):
        out[i] = rot[vpos[(j + s) % len(vpos)]]
    cpos = [i for i, ch in enumerate(rot) if ch in _UNIQUE_CONS]
    for j, i in enumerate(cpos):
        out[i] = rot[cpos[(j + s2) % len(cpos)]]
    return "".join(out)


def replicate(spark, mult: int, need_customer: bool = False) -> str:
    """Replicate events/documents mult×, remapping keys so series/doc
    cardinality scales with volume (pure copies would only deepen each
    series, skewing windows instead of widening the key space)."""
    out = os.path.join(SCRATCH, f"x{mult}")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    copies = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("copy")

    ev = load_table(spark, BASE_SF, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ev.select("*", copies).withColumn(
        "user_id", F.col("user_id") + F.col("copy") * n_users
    ).withColumn("event_id", F.col("event_id") + F.col("copy") * n_events).drop(
        "copy"
    ).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    docs = load_table(spark, BASE_SF, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    docs = docs.select("*", copies).withColumn(
        "doc_id", F.col("doc_id") + F.col("copy") * n_docs
    )
    # constant-duplicate-density mode: plain replication gives every doc
    # mult-1 EXACT twins, so dedup-family pair OUTPUT grows quadratically
    # in the multiple BY CORRECTNESS (the algorithm must emit every
    # qualifying pair) and the probe measures that output flood, not the
    # plan. With UNIQUE=1 each copy's letters are Caesar-rotated by the
    # copy index — token structure, lengths and within-copy duplicate
    # rate are preserved, but cross-copy shingles are disjoint, which is
    # how a real corpus grows (new vocabulary, constant dup density).
    if os.environ.get("SPARK_GRAFT_PROBE_UNIQUE"):
        lo = _UNIQUE_ALPHABET
        if mult > 260:
            raise ValueError("UNIQUE mode supports at most 260 copies")
        rotated = F.col("text")
        for k in range(1, mult):
            m = unique_mapping(k)
            rotated = F.when(
                F.col("copy") == k,
                F.translate("text", lo + lo.upper(), m + m.upper()),
            ).otherwise(rotated)
        docs = docs.withColumn("text", rotated)
    docs.drop("copy").write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = load_table(spark, BASE_SF, "embeddings")
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    emb.select("*", copies).withColumn(
        "vec_id", F.col("vec_id") + F.col("copy") * n_vecs
    ).drop("copy").write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    # customer (the d10 record-linkage probe): remap the key AND rebuild
    # the fixed-form name from it — pure copies would give every name
    # mult-1 exact lev-0 twins, so pair OUTPUT (not the plan) would grow
    # quadratically in the multiple and the probe would measure the
    # replication artifact instead of the blocking strategy
    if not need_customer:
        # only the d10 record-linkage probe reads customer — skip the
        # replication work (max-key scan + full rewrite per multiple)
        # on runs that never consume it
        cu = None
    else:
        cu = load_table(spark, BASE_SF, "customer")
    if cu is not None:
        n_cust = cu.agg(F.max("c_custkey")).collect()[0][0] + 1
        cu = cu.select("*", copies).withColumn(
            "c_custkey", F.col("c_custkey") + F.col("copy") * n_cust
        )
        # id-density CONTROL (r9 verdict task 3): sequential replication
        # packs every key into the low end of the 9-digit name space, so
        # d10's deletion-neighborhood blocks saturate their 10-member
        # bound as the multiple grows (the diagnosed cause of the 64x
        # 0.84 ratio). HASH_IDS=1 spreads keys through the whole space
        # with a bijective affine permutation (odd multiplier coprime to
        # 10^9 — no collisions, so no artificial lev-0 twins), keeping
        # LOCAL density constant across multiples the way a real
        # entity corpus grows.
        if os.environ.get("SPARK_GRAFT_PROBE_HASH_IDS"):
            cu = cu.withColumn(
                "c_custkey", (F.col("c_custkey") * 536870909) % 1_000_000_000
            )
        (
            cu.withColumn(
                "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
            )
            .drop("copy")
            .write.mode("overwrite")
            .parquet(os.path.join(out, "customer.parquet"))
        )

    # adversarial hot-key mode (r7 verdict task 5): remap the given
    # fraction of EVENT rows onto one user so the single-exchange
    # window families (w21/w22/w23/j13) face a straggler partition AQE
    # cannot split (windows are not salt-able)
    skew = float(os.environ.get("SPARK_GRAFT_PROBE_SKEW", "0") or 0)
    if skew > 0:
        ev_path = os.path.join(out, "events.parquet")
        skewed = (
            spark.read.parquet(ev_path)
            .withColumn(
                "user_id",
                F.when(
                    F.pmod(F.xxhash64("event_id"), F.lit(int(round(1 / skew)))) == 0,
                    F.lit(0),
                ).otherwise(F.col("user_id")),
            )
        )
        tmp = ev_path + ".skewed"
        skewed.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(ev_path)
        os.rename(tmp, ev_path)
    return out


def force(df) -> None:
    df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
        F.count("h"), F.expr("bit_xor(h)")
    ).collect()


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale-probe")
    specs = all_queries()
    force(specs["w2_rolling_stats"].spark(spark, "/root/testdata/sf0.001"))  # warm

    # Optional subset (comma-separated query names) for targeted runs,
    # e.g. probing only the heaviest join-shaped ops at 64×:
    #   SPARK_GRAFT_PROBE_QUERIES=d2_minhash_lsh,e6_ann_ivfpq scripts/scale_probe.py 1 64
    subset = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    probe = tuple(subset.split(",")) if subset else PROBE

    results: dict[str, dict[str, float]] = {q: {} for q in probe}
    for mult in mults:
        sf_dir = replicate(spark, mult, need_customer=any(q.startswith("d10") for q in probe))
        for name in probe:
            if name in (
                "d6_canonical_docs",
                "g1_pagerank_neardup",
                "g2_pagerank_weighted",
                "g3_triangle_count",
            ):
                # Measure the retention step AS DEPLOYED: the verified
                # pair set comes from the d2 stage that already ran
                # (verified_pairs_export is written once per process+sf
                # and reused); the chain's own cost is measured under
                # d2_minhash_lsh above. Seeding is untimed.
                from pipeline_mf_etl_spark.queries.dedup import verified_pairs_export

                verified_pairs_export(spark, sf_dir)
            if name in specs:
                fn = specs[name].spark
            else:
                # unregistered measured-contrast variants (e.g. the w22
                # window twin probed against the skew-immune default, or
                # d2_minhash_lsh_capped — the flood-cap probe entry
                # point that keeps the registered d2 env-immune)
                from pipeline_mf_etl_spark.queries import dedup as _d
                from pipeline_mf_etl_spark.queries import windows as _w

                fn = getattr(_w, name, None) or getattr(_d, name)
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            results[name][f"x{mult}"] = round(time.perf_counter() - t0, 2)
            # incremental line so a killed/partial run still leaves data
            print(f"# {name} x{mult}: {results[name][f'x{mult}']}s", flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)

    lo, hi = f"x{mults[0]}", f"x{mults[-1]}"
    ratio = mults[-1] / mults[0]
    for name in probe:
        r = results[name]
        growth = r[hi] / r[lo] if r[lo] else float("inf")
        r["growth_vs_linear"] = round(growth / ratio, 2)  # 1.0 = perfectly linear
    print(json.dumps({"base": BASE_SF, "multiples": mults, "timings": results}))


if __name__ == "__main__":
    main()
