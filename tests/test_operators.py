"""Randomized property tests for the custom scale operators.

Oracle parity checks them on one dataset; these drive them with seeded
random data — duplicate timestamps, null values, empty groups — against
independent references (pandas ``merge_asof``, plain groupBy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.asof import asof_join
from pipeline_mf_etl_spark.operators.skew import salted_agg


def _random_series(rng, n, n_keys):
    return pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n),
            "t": rng.integers(0, 50, n).astype("int64"),
            "v": np.round(rng.normal(10, 3, n), 6),
        }
    )


def test_asof_join_matches_pandas_merge_asof(spark):
    """Includes NULL right-side values: a matched right row whose value is
    NULL must yield NULL (merge_asof semantics), NOT an older non-null
    value; and with two value columns both must come from the SAME
    matched row, never a mix of rows."""
    rng = np.random.default_rng(7)
    left = _random_series(rng, 400, 8).rename(columns={"v": "lv"})
    left["row_id"] = np.arange(len(left))
    right = _random_series(rng, 300, 8).rename(columns={"v": "rv"})
    # dedupe right to one row per (key, time): keep max rv — ties must be
    # resolved identically on both paths
    right = right.groupby(["k", "t"], as_index=False)["rv"].max()
    # second value column correlated to the first, then punch NULL holes
    # into rv only — a per-column fill would mix rows here
    right["rv2"] = np.round(right["rv"] * 2 + 1, 6)
    null_mask = rng.random(len(right)) < 0.3
    right.loc[null_mask, "rv"] = None

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "t",
            ["rv", "rv2"],
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )

    exp = pd.merge_asof(
        left.sort_values(["t", "row_id"]),
        right.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("row_id").reset_index(drop=True)

    assert len(got) == len(exp)
    for col in ("rv", "rv2"):
        pd.testing.assert_series_equal(
            got[col], exp[col], check_names=False, check_exact=False, rtol=1e-9
        )


def test_salted_agg_equals_plain_groupby(spark):
    rng = np.random.default_rng(11)
    pdf = _random_series(rng, 2000, 4)
    pdf.loc[rng.integers(0, 2000, 100), "v"] = None  # nulls must not count
    df = spark.createDataFrame(pdf)

    salted = salted_agg(
        df,
        ["k"],
        {
            "n": ("count", F.col("v")),
            "s": ("sum", F.col("v")),
            "m": ("avg", F.col("v")),
            "lo": ("min", F.col("v")),
            "hi": ("max", F.col("v")),
        },
        salt=F.col("t"),
        n_salts=7,
    ).toPandas().set_index("k").sort_index()

    plain = (
        df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("m"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    pd.testing.assert_frame_equal(salted, plain, check_exact=False, rtol=1e-9)


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF with nprobe=2 of 4 lists must recover most of the exact top-5,
    and must be deterministic across runs (no RNG anywhere)."""
    from pipeline_mf_etl_spark.operators.similarity import (
        brute_force_topk,
        fit_ivf_centroids,
        ivf_topk,
    )

    rng = np.random.default_rng(3)
    # clustered vectors so inverted lists are meaningful
    centers = rng.normal(0, 1, (4, 16))
    X = np.repeat(centers, 50, axis=0) + rng.normal(0, 0.3, (200, 16))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(200), "v": [list(map(float, r)) for r in X]}
    )
    v = spark.createDataFrame(pdf)
    queries = v.filter(F.col("vec_id") < 10)

    exact = brute_force_topk(queries, v, k=5).toPandas()
    cents = fit_ivf_centroids(v, n_centroids=4, iters=5)
    approx = ivf_topk(queries, v, cents, k=5, nprobe=2).toPandas()

    exact_sets = exact.groupby("query_id")["cand_id"].apply(set)
    approx_sets = approx.groupby("query_id")["cand_id"].apply(set)
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets.index
    )
    recall = hits / (5 * len(exact_sets))
    assert recall >= 0.8, f"IVF recall@5 too low: {recall:.2f}"

    # per-query result count and determinism
    assert (approx.groupby("query_id").size() == 5).all()
    again = ivf_topk(queries, v, cents, k=5, nprobe=2).toPandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["query_id", "rank"]).reset_index(drop=True),
        again.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_lsh_neardup_matches_bruteforce(spark):
    """Hyperplane-LSH near-dup (candidates + verify) must return EXACTLY
    the brute-force pair set — the band count is derived from the
    threshold so a qualifying pair is missed with prob <= 1e-9 — at both
    a low threshold (weak pruning) and a high one (hard pruning on
    clustered near-duplicates)."""
    from pipeline_mf_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_bruteforce,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (40, 32))
    # 40 originals + 40 jittered near-copies (cos ~0.97) + 120 randoms
    X = np.vstack([base, base + rng.normal(0, 0.15, base.shape),
                   rng.normal(0, 1, (120, 32))])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(X)), "v": [list(map(float, r)) for r in X]}
    )
    v = spark.createDataFrame(pdf)

    for thr, r in ((0.9, 4), (0.4, 2)):
        got = embedding_near_dup_pairs(v, thr, rows_per_band=r, dim=32)
        want = embedding_near_dup_pairs_bruteforce(v, thr)
        g = got.toPandas().sort_values(["a", "b"]).reset_index(drop=True)
        w = want.toPandas().sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w)
        assert len(w) > 0  # the fixture must actually exercise the verify


def test_connected_components_matches_union_find(spark):
    """Min-label-propagation CC must equal a reference union-find on a
    seeded random graph (chains, stars, singleton-free pair set)."""
    from pipeline_mf_etl_spark.operators.dedupe import connected_components

    rng = np.random.default_rng(23)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, (80, 2)) if a != b]

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    # canonical representative = min node id per component
    comp_min = {}
    for n, r in want.items():
        comp_min.setdefault(r, n)
        comp_min[r] = min(comp_min[r], n)
    want = {n: comp_min[find(n)] for n in parent}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == want


def test_connected_components_frees_checkpoint_blocks(spark):
    """Each propagation round localCheckpoints a frame; superseded
    rounds' blocks must be unpersisted, not leak for the session
    lifetime — after the call at most the RETURNED labels frame may
    hold blocks beyond whatever was already cached before."""
    from pipeline_mf_etl_spark.operators.dedupe import connected_components

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6)]
    labels = connected_components(spark.createDataFrame(edges, "a long, b long"))
    assert labels.count() > 0  # returned frame is readable
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1, (
        f"connected_components leaked {after - before - 1} checkpoint block sets"
    )


def test_dbscan_matches_reference_semantics(spark):
    """NumPy DBSCAN fallback: two dense blobs + scattered noise must come
    back as exactly two clusters with the blob members together and the
    scattered points labeled -1; deterministic across calls."""
    from pipeline_mf_etl_spark.operators.density import dbscan_labels

    rng = np.random.default_rng(9)
    blob_a = rng.normal(0.0, 0.05, (50, 2))
    blob_b = rng.normal(5.0, 0.05, (60, 2))
    noise = rng.uniform(10, 20, (15, 2))
    X = np.vstack([blob_a, blob_b, noise])

    labels = dbscan_labels(X, eps=0.5, min_pts=5)
    assert set(labels[:50]) == {labels[0]} and labels[0] != -1
    assert set(labels[50:110]) == {labels[50]} and labels[50] != -1
    assert labels[0] != labels[50]
    assert (labels[110:] == -1).all()
    assert (dbscan_labels(X, eps=0.5, min_pts=5) == labels).all()


def test_lsh_high_threshold_prunes_candidates(spark):
    """The production LSH regime — high threshold, wide bands (r≈log2 N),
    relaxed miss bound — must (a) still return exactly the brute-force
    pair set on the clustered fixture (deterministic planes; detection
    probability ~1 for true near-dups at cos≈0.99) and (b) admit far
    fewer candidates than the N²/2 pair space, the claim that makes the
    two-stage design worth running at scale."""
    from pipeline_mf_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_bruteforce,
        lsh_hyperplane_candidates,
    )

    rng = np.random.default_rng(17)
    base = rng.normal(0, 1, (40, 32))
    X = np.vstack([base, base + rng.normal(0, 0.05, base.shape),
                   rng.normal(0, 1, (120, 32))])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(X)), "v": [list(map(float, r)) for r in X]}
    )
    v = spark.createDataFrame(pdf)
    n = len(X)

    kw = dict(rows_per_band=12, miss_target=1e-4, dim=32)
    got = embedding_near_dup_pairs(v, 0.9, **kw)
    want = embedding_near_dup_pairs_bruteforce(v, 0.9)
    g = got.toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    w = want.toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)
    assert len(w) >= 40  # every jittered copy pairs with its original

    n_cand = lsh_hyperplane_candidates(v, 0.9, **kw).count()
    all_pairs = n * (n - 1) // 2
    assert n_cand < all_pairs * 0.2, (
        f"high-threshold LSH admitted {n_cand}/{all_pairs} pairs — no pruning"
    )


def test_ewm_smooth_many_matches_single(spark):
    """The multi-column island must produce bit-identical output to the
    single-column operator for each column (same pandas recursion, same
    NaN->NULL normalization) — guards the two implementations against
    drifting until they are unified."""
    import pyspark.sql.functions as F

    from pipeline_mf_etl_spark.operators.ewm import ewm_smooth, ewm_smooth_many
    from pipeline_mf_etl_spark.sources.readers import load_table
    from tests.conftest import SF_ORACLE

    ev = load_table(spark, SF_ORACLE, "events").select(
        "user_id", "ts", "event_id", "value", (F.col("value") * 2).alias("v2")
    )
    many = ewm_smooth_many(
        ev, ["user_id"], ["ts", "event_id"], {"a": "value", "b": "v2"}, n=10
    ).select("event_id", "a", "b")
    one_a = ewm_smooth(ev, ["user_id"], ["ts", "event_id"], "value", 10, "a").select(
        "event_id", "a"
    )
    one_b = ewm_smooth(ev, ["user_id"], ["ts", "event_id"], "v2", 10, "b").select(
        "event_id", "b"
    )
    joined = many.join(one_a.withColumnRenamed("a", "a1"), "event_id").join(
        one_b.withColumnRenamed("b", "b1"), "event_id"
    )
    bad = joined.filter(
        (~(F.col("a").eqNullSafe(F.col("a1")))) | (~(F.col("b").eqNullSafe(F.col("b1"))))
    )
    assert bad.count() == 0


def test_rowwise_buckets_match_grouped(spark):
    """minhash_band_buckets_rowwise must emit bit-identical
    (doc_id, band, band_hash) rows to the exploded-shingle groupBy path
    (minhash_signatures + the band construction of lsh_candidate_pairs)
    — the rowwise form exists ONLY so the same arithmetic runs on a
    stream; any divergence would silently split the LSH bucket space."""
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.operators.dedupe import (
        exploded_shingles,
        minhash_band_buckets_rowwise,
        minhash_signatures,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    sig = minhash_signatures(exploded_shingles(docs, "doc_id", "text", n=3), "doc_id")
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"mh_{i}").cast("string") for i in range(b * 4, (b + 1) * 4)]
                )
            )
            for b in range(4)
        ]
    )
    grouped = set(
        map(
            tuple,
            sig.select("doc_id", F.posexplode(band_hashes).alias("band", "band_hash")).collect(),
        )
    )
    rowwise = set(
        map(tuple, minhash_band_buckets_rowwise(docs, "doc_id", "text").collect())
    )
    assert grouped == rowwise
    assert len(rowwise) > 0


def test_pq_adc_recall_vs_exact(spark):
    """PQ/ADC ranking must be a useful approximation of exact L2. On
    64-d data with concentrated pairwise distances (the hardest case
    for quantization), exact top-5 recall is not the right bar — the
    robust property is CONTAINMENT: the ADC top-5 should land in the
    true top decile of the corpus far above the ~10% chance rate
    (measured 0.60 at sf0.001; floor 0.35). The per-row ADC score must
    equal the NumPy-recomputed LUT sum exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
        pq_luts,
        pq_topk,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    books = fit_pq_codebooks(v, m=8, ksub=16, iters=8)
    codes = pq_encode(v, books)
    queries = v.filter(F.col("vec_id") < 8)
    got = pq_topk(codes, pq_luts(queries, books), k=5).collect()

    X = {r["vec_id"]: np.asarray(r["v"]) for r in v.collect()}
    code_map = {r["vec_id"]: r["codes"] for r in codes.collect()}
    C = [np.asarray(b) for b in books]
    decile = max(5, len(X) // 10)
    hits = total = 0
    for r in queries.collect():
        qid, qv = r["vec_id"], np.asarray(r["v"])
        exact = sorted(
            ((float(((qv - x) ** 2).sum()), i) for i, x in X.items() if i != qid)
        )[:decile]
        exact_ids = {i for _, i in exact}
        mine = {row["cand_id"] for row in got if row["query_id"] == qid}
        assert len(mine) == 5
        hits += len(mine & exact_ids)
        total += 5
        # ADC exactness: the Spark score equals the NumPy LUT sum
        ds = len(qv) // 8
        for row in got:
            if row["query_id"] != qid:
                continue
            cd = code_map[row["cand_id"]]
            adc = sum(
                float(((qv[m * ds : (m + 1) * ds] - C[m][cd[m]]) ** 2).sum())
                for m in range(8)
            )
            assert abs(row["adc"] - round(adc, 6)) <= 1e-6
    assert hits / total >= 0.35, f"top-decile containment too low: {hits}/{total}"


def test_ivfpq_probing_and_containment(spark):
    """IVF-PQ structural + quality contract: every returned candidate
    must belong to one of its query's probed lists, each query returns
    exactly k results, and the ADC top-5 lands in the exact-L2 top
    decile far above chance (measured 0.62 at sf0.001; floor 0.3 —
    probing restricts candidates to ~nprobe/n_lists of the corpus, so
    the bar sits below e5's unrestricted PQ)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.operators.similarity import (
        fit_coarse_centroids_l2,
        fit_residual_codebooks,
        ivfpq_encode,
        ivfpq_query_luts,
        ivfpq_topk,
    )
    from pipeline_mf_etl_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    coarse = fit_coarse_centroids_l2(v, n_centroids=8, iters=8)
    books = fit_residual_codebooks(v, coarse)
    codes = ivfpq_encode(v, coarse, books)
    queries = v.filter(F.col("vec_id") < 8)
    luts = ivfpq_query_luts(queries, coarse, books, nprobe=2)
    got = ivfpq_topk(codes, luts, k=5).collect()

    cellmap = {r["vec_id"]: r["centroid_id"] for r in codes.collect()}
    probed: dict[int, set[int]] = {}
    for r in luts.collect():
        probed.setdefault(r["query_id"], set()).add(r["centroid_id"])
    assert all(
        cellmap[row["cand_id"]] in probed[row["query_id"]] for row in got
    ), "candidate outside its query's probed lists"

    X = {r["vec_id"]: np.asarray(r["v"]) for r in v.collect()}
    decile = max(5, len(X) // 10)
    hits = tot = 0
    for r in queries.collect():
        qid, qv = r["vec_id"], np.asarray(r["v"])
        exact = sorted(
            ((float(((qv - x) ** 2).sum()), i) for i, x in X.items() if i != qid)
        )[:decile]
        ids = {i for _, i in exact}
        mine = {row["cand_id"] for row in got if row["query_id"] == qid}
        assert len(mine) == 5
        hits += len(mine & ids)
        tot += 5
    assert hits / tot >= 0.3, f"top-decile containment too low: {hits}/{tot}"


def test_substring_dedup_planted_coverage(spark, tmp_path):
    """d8 on a planted corpus: two docs share a 10-token run (three
    overlapping 8-token spans); the union coverage must count each
    token once (10, not 24), and the unique doc must report zeros."""
    import pandas as pd

    from pipeline_mf_etl_spark.queries import all_queries

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        1: f"one two {shared} three four",
        2: f"{shared} five six seven",
        3: "entirely different words with no repeated span at all here ok",
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(f"{tmp_path}/documents.parquet")

    rows = {r["doc_id"]: r for r in
            all_queries()["d8_substring_dedup"].spark(spark, str(tmp_path)).collect()}
    assert rows[3]["n_dup_spans"] == 0 and rows[3]["n_covered_tokens"] == 0
    for d in (1, 2):
        assert rows[d]["n_dup_spans"] == 3, rows[d]  # 10-token run -> 3 spans
        assert rows[d]["n_covered_tokens"] == 10, rows[d]  # union, not 3*8
        assert rows[d]["covered_share"] == round(10 / rows[d]["n_tokens"], 6)


def test_semantic_blas_kernel_matches_hof(spark):
    """The production BLAS verify kernel (per-cell matmul,
    applyInPandas) must produce the exact same within-cell pair set as
    the certified JVM-HOF dot path over the real corpus — same cells,
    same threshold, same 6-dp rounding."""
    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.operators.similarity import (
        dot,
        fit_ivf_centroids,
        ivf_assign_cells,
        norm,
        semantic_dup_pairs_blas,
    )
    from tests.conftest import SF_ORACLE

    from pipeline_mf_etl_spark.sources.readers import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = fit_ivf_centroids(emb, n_centroids=8, iters=5)
    assign = ivf_assign_cells(emb, cents).select(
        "vec_id", "v", F.col("centroid_id").cast("int").alias("centroid_id")
    )
    blas = {
        (r["pa"], r["pb"])
        for r in semantic_dup_pairs_blas(assign, 0.4).collect()
    }
    nv = assign.select(
        "centroid_id", "vec_id", norm(F.col("v")).alias("n"), "v"
    ).select(
        "centroid_id", "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("n")).alias("nv"),
    )
    x = nv.select("centroid_id", F.col("vec_id").alias("pa"), F.col("nv").alias("va"))
    y = nv.select("centroid_id", F.col("vec_id").alias("pb"), F.col("nv").alias("vb"))
    hof = {
        (r["pa"], r["pb"])
        for r in x.join(y, "centroid_id")
        .filter(F.col("pa") < F.col("pb"))
        .filter(F.round(dot(F.col("va"), F.col("vb")), 6) >= 0.4)
        .collect()
    }
    assert blas == hof and len(hof) > 0


def test_lsh_bucket_cap_bounds_giant_cluster(spark):
    """One giant duplicate cluster floods a band bucket with O(cluster)
    members; the max_bucket cap must bound candidate output at
    C(cap, 2) per bucket instead of C(cluster, 2) — the SCALE.md
    adversarial-density mitigation."""
    from pipeline_mf_etl_spark.operators.dedupe import (
        exploded_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    text = "the same boilerplate sentence repeated across the entire cluster"
    docs = spark.createDataFrame(
        [(i, text) for i in range(100)], "doc_id long, text string"
    )
    sig = minhash_signatures(
        exploded_shingles(docs, "doc_id", "text", n=3), "doc_id"
    )
    uncapped = lsh_candidate_pairs(sig, "doc_id").count()
    assert uncapped == 100 * 99 // 2  # quadratic blow-up, the failure mode
    capped = lsh_candidate_pairs(sig, "doc_id", max_bucket=10)
    rows = capped.collect()
    # identical docs share every band bucket; the cap keeps the 10
    # smallest ids in each, so output is exactly C(10,2) distinct pairs
    assert len(rows) == 10 * 9 // 2
    assert all(r["a"] < 10 and r["b"] < 10 for r in rows)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True must produce identical components via fault-
    tolerant checkpoints."""
    from pipeline_mf_etl_spark.operators.dedupe import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "a long, b long"
    )
    base = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    rel = {
        r["node"]: r["component"]
        for r in connected_components(edges, reliable=True).collect()
    }
    assert base == rel
    assert rel == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_morton_key_bit_interleave_exact(spark):
    """Morton key ground truth on hand-computable points, plus the SQL
    twin must produce bit-identical keys (the oracle relies on it)."""
    import duckdb

    from pipeline_mf_etl_spark.operators.layout import morton_key, morton_key_sql
    from pyspark.sql import functions as F

    cases = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (3, 3, 15), (2, 1, 6),
             (65535, 0, 0x55555555), (0, 65535, 0xAAAAAAAA),
             (65535, 65535, 0xFFFFFFFF), (70000, 0, 0x55555555)]  # clamps
    df = spark.createDataFrame([(a, b) for a, b, _ in cases], "a long, b long")
    got = [r["z"] for r in df.select(morton_key(F.col("a"), F.col("b")).alias("z")).collect()]
    assert got == [z for _, _, z in cases]
    sql_got = [
        duckdb.sql(f"SELECT {morton_key_sql(str(a), str(b))} AS z").fetchone()[0]
        for a, b, _ in cases
    ]
    assert sql_got == [z for _, _, z in cases]


def test_zorder_buckets_have_locality_on_both_dimensions(spark):
    """The point of Z-ordering: bucketing by the interleaved key keeps
    BOTH dimensions' per-bucket min/max spans tight, where bucketing by
    one column's sort leaves the other column full-width (no row-group
    skipping on it). Uniform grid, 64 buckets: the z-layout's mean span
    on dimension b must be a small fraction of the a-sorted layout's."""
    from pipeline_mf_etl_spark.operators.layout import morton_key
    from pyspark.sql import functions as F

    n = 1 << 12  # 64x64 grid
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    # bins scaled to 16-bit like o18 does
    z = morton_key(F.col("a") * 1024, F.col("b") * 1024)
    zspan = (
        df.select("a", "b", F.shiftright(z, 26).alias("bucket"))  # 64 buckets
        .groupBy("bucket")
        .agg((F.max("b") - F.min("b")).alias("span_b"))
        .agg(F.avg("span_b"))
        .collect()[0][0]
    )
    aspan = (
        df.select("a", "b", (F.col("a") % 64).alias("bucket"))  # a-sorted files
        .groupBy("bucket")
        .agg((F.max("b") - F.min("b")).alias("span_b"))
        .agg(F.avg("span_b"))
        .collect()[0][0]
    )
    assert zspan <= aspan / 4, (zspan, aspan)


def test_containment_prefix_catches_what_lsh_misses(spark):
    """The d11 size-skew recall hole (r7 verdict task 4): a tiny doc
    quoted wholesale inside a huge one has containment 1.0 but Jaccard
    ~|A|/|B|, so symmetric MinHash LSH (band collision prob ~ J^rows)
    structurally misses it. Plant such a pair, assert the OLD candidate
    path (d2's LSH) actually misses it and the rare-prefix path catches
    it — plus every other tau-qualifying pair (recall completeness vs a
    brute-force all-pairs computation)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.operators.dedupe import (
        containment_candidate_pairs,
        exploded_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rng = __import__("numpy").random.default_rng(23)
    words = [f"w{i:03d}" for i in range(400)]
    tiny = " ".join(words[i] for i in rng.permutation(30)[:12])
    huge = tiny + " " + " ".join(words[int(i)] for i in rng.integers(40, 400, 900))
    docs = [(0, tiny), (1, huge)]
    # background docs so LSH buckets and doc frequencies are non-trivial
    for d in range(2, 30):
        docs.append((d, " ".join(words[int(i)] for i in rng.integers(0, 400, 60))))
    sdf = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    sh = exploded_shingles(sdf, "doc_id", "text", n=3).persist()
    try:
        # the planted pair qualifies: containment(tiny->huge) == 1.0
        sizes = {r["doc_id"]: r["c"] for r in sh.groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
        inter01 = (
            sh.filter(F.col("doc_id") == 0)
            .select("shingle")
            .join(sh.filter(F.col("doc_id") == 1).select("shingle"), "shingle")
            .count()
        )
        assert inter01 == sizes[0], "fixture broke: tiny not fully contained"
        jacc = inter01 / (sizes[0] + sizes[1] - inter01)
        assert jacc < 0.2, f"fixture broke: pair not size-skewed (J={jacc:.2f})"

        sig = minhash_signatures(sh, "doc_id", k=16)
        lsh = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sig, "doc_id", k=16, bands=4).collect()}
        assert (0, 1) not in lsh, (
            "fixture no longer demonstrates the hole: LSH found the pair"
        )

        cand = {
            (r["a"], r["b"])
            for r in containment_candidate_pairs(sh, "doc_id", 4, 5).collect()
        }
        assert (0, 1) in cand, "prefix filtering missed the planted pair"

        # recall completeness: every pair with max containment >= 0.8
        # (brute force over all pairs) must be in the candidate set
        a = sh.select(F.col("doc_id").alias("a"), "shingle")
        b = sh.select(F.col("doc_id").alias("b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        qualifying = {
            (r["a"], r["b"])
            for r in inter
            if max(r["n"] / sizes[r["a"]], r["n"] / sizes[r["b"]]) >= 0.8
        }
        assert qualifying, "fixture broke: no qualifying pairs at all"
        missed = qualifying - cand
        assert not missed, f"prefix filtering dropped qualifying pairs: {missed}"

        # the probe side is bounded: each doc probes with at most
        # |A| - ceil(0.8|A|) + 1 shingles, ~20% of its set + 1
        total_sh = sum(sizes.values())
        bound = sum(sz - (4 * sz + 4) // 5 + 1 for sz in sizes.values())
        assert bound < 0.3 * total_sh + len(sizes), "prefix bound math drifted"
    finally:
        sh.unpersist()


def test_d10_masked_blocking_catches_early_typo(spark, tmp_path):
    """The textbook ER failure of single-key blocking (r7 verdict task
    7): a typo INSIDE the prefix key lands the pair in different
    prefix blocks. Plant early-, middle- and late-digit typo pairs; a
    prefix-only pass must miss the first, the shipped masked-position
    (deletion-neighborhood) query must catch all three; comparison
    volume must equal Σ C(block,2) over the (pos, masked) keys (the
    blocking bound, no hidden all-pairs)."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from pipeline_mf_etl_spark.queries import all_queries
    from tests.conftest import canonical_rows

    base = [f"Customer#{i:09d}" for i in range(1, 41)]
    names = base + [
        "Customer#100000007",  # early typo twin of #000000007 (pos 10, P1)
        "Customer#000500013",  # middle typo twin of #000000013 (pos 13, P2)
        "Customer#000000032",  # late typo twin of #000000031 (pos 18, P3)
    ]
    pdf = pd.DataFrame(
        {
            "c_custkey": range(1, len(names) + 1),
            "c_name": names,
            "c_nationkey": [i % 5 for i in range(len(names))],
        }
    )
    pdf.to_parquet(f"{tmp_path}/customer.parquet")

    spec = all_queries()["d10_record_linkage"]
    sdf = spec.spark(spark, str(tmp_path))
    rows = [tuple(r) for r in sdf.collect()]
    pairs = {(r[2], r[3]) for r in rows}
    for planted in [
        ("Customer#000000007", "Customer#100000007"),  # typo in digit 1
        ("Customer#000000013", "Customer#000500013"),  # typo in digit 4
        ("Customer#000000031", "Customer#000000032"),  # typo in digit 9
    ]:
        assert planted in pairs, f"masked blocking missed planted pair {planted}"

    # a prefix-only single pass really does miss the early typo (the
    # hole the multi-pass design exists to close)
    cu = spark.read.parquet(f"{tmp_path}/customer.parquet")
    blk = cu.select("c_custkey", "c_name", F.substring("c_name", 1, 14).alias("b"))
    one_pass = (
        blk.alias("x")
        .join(blk.alias("y"), "b")
        .filter(F.col("x.c_custkey") < F.col("y.c_custkey"))
        .filter(F.levenshtein(F.col("x.c_name"), F.col("y.c_name")) <= 1)
        .select(F.col("x.c_name").alias("na"), F.col("y.c_name").alias("nb"))
    )
    assert ("Customer#000000007", "Customer#100000007") not in {
        (r["na"], r["nb"]) for r in one_pass.collect()
    }

    # comparison volume == Σ C(block,2) over the (pos, masked) keys
    # (pre-dedup): the blocking bound, no hidden all-pairs
    keyed = cu.select(
        "c_custkey",
        "c_name",
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("pos"),
    ).withColumn(
        "masked",
        F.concat(
            F.expr("substring(c_name, 10, pos - 1)"),
            F.expr("substring(c_name, 10 + pos, 9 - pos)"),
        ),
    )
    sizes = [
        r["n"]
        for r in keyed.groupBy("pos", "masked").agg(F.count("*").alias("n")).collect()
    ]
    expected = sum(n * (n - 1) // 2 for n in sizes)
    total_cmp = (
        keyed.alias("x")
        .join(keyed.alias("y"), ["pos", "masked"])
        .filter(F.col("x.c_custkey") < F.col("y.c_custkey"))
        .count()
    )
    assert total_cmp == expected
    # on sequential ids every key pins 8 of the 9 digits: blocks stay
    # single-digit-sized (10 per decade run, +1 for the planted twin),
    # unlike the fragment-pair scheme's 1000-row high-order blocks this
    # rewrite replaced
    assert max(sizes) <= 11

    # oracle parity on the synthetic table (same UNION-dedup semantics)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet')"
    )
    cur = con.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    assert canonical_rows(rows, list(sdf.columns)) == canonical_rows(
        cur.fetchall(), dcols
    )


def test_hdbscan_hand_computed_case():
    """Tiny 1-D case checkable by hand: two triplets 8 apart, unit
    spacing inside. Condensed tree: root splits at lambda=1/8 into two
    size-3 clusters; each is a leaf cluster (its internal splits only
    shed sub-min_cluster_size sides), so EOM selects both."""
    import numpy as np

    from pipeline_mf_etl_spark.operators.density import hdbscan_labels

    X = np.array([[0.0], [1.0], [2.0], [10.0], [11.0], [12.0]])
    labels = hdbscan_labels(X, min_cluster_size=2)
    assert labels.tolist() == [0, 0, 0, 1, 1, 1]


def test_hdbscan_variable_density_beats_single_eps():
    """The case single-eps DBSCAN structurally cannot handle: one tight
    cluster (sigma .05) and one loose cluster (sigma .8). HDBSCAN must
    recover both intact; DBSCAN at the tight-cluster eps must lose the
    loose cluster to noise (this contrast is the reason m6's fallback
    is now exact HDBSCAN, not DBSCAN)."""
    import numpy as np

    from pipeline_mf_etl_spark.operators.density import (
        dbscan_labels,
        eps_from_quantile,
        hdbscan_labels,
        pairwise_dist_chunked,
    )

    rng = np.random.default_rng(23)
    A = rng.normal([0, 0], 0.05, (50, 2))
    B = rng.normal([20, 20], 0.8, (50, 2))
    X = np.vstack([A, B])

    labels = hdbscan_labels(X, min_cluster_size=5)
    la, lb = set(labels[:50].tolist()), set(labels[50:].tolist())
    assert la == {0} and lb == {1}, (la, lb)
    # determinism
    assert (hdbscan_labels(X, min_cluster_size=5) == labels).all()

    eps = eps_from_quantile(X)
    dl = dbscan_labels(X, eps, 5, D=pairwise_dist_chunked(X))
    assert set(dl[50:].tolist()) == {-1}  # loose cluster lost at tight eps


def test_hdbscan_noise_and_degenerate_inputs():
    import numpy as np
    import pytest

    from pipeline_mf_etl_spark.operators.density import hdbscan_labels

    rng = np.random.default_rng(29)
    # sparse uniform scatter: no 15-point density peak -> all noise
    U = rng.uniform(0, 100, (30, 2))
    assert set(hdbscan_labels(U, min_cluster_size=15).tolist()) == {-1}
    # fewer points than min_cluster_size -> all noise
    assert hdbscan_labels(U[:3], min_cluster_size=5).tolist() == [-1, -1, -1]
    # duplicate points (zero distances) must not break the lambda math
    Z = np.vstack([np.zeros((10, 2)), np.ones((10, 2)) * 50])
    lz = hdbscan_labels(Z, min_cluster_size=5)
    assert set(lz[:10].tolist()) == {0} and set(lz[10:].tolist()) == {1}
    with pytest.raises(ValueError, match="min_cluster_size"):
        hdbscan_labels(U, min_cluster_size=1)


def test_d2_env_bucket_cap_bounds_flood(spark, tmp_path, monkeypatch):
    """The deterministic bucket cap lives in the UNREGISTERED probe
    entry point d2_minhash_lsh_capped (explicit arg or env knob): a
    near-exact duplicate flood emits C(cap,2) verified pairs instead of
    C(flood,2), capped output is a subset of exact output — and the
    REGISTERED d2 query ignores the env var entirely (r9 ADVICE: a
    probe env var left set must not diverge d2 from its exact oracle)."""
    import pandas as pd

    from pipeline_mf_etl_spark.queries import all_queries
    from pipeline_mf_etl_spark.queries.dedup import d2_minhash_lsh_capped

    text = "one boilerplate mirror sentence repeated across every page of the crawl"
    n, cap = 40, 6
    pd.DataFrame({"doc_id": range(n), "text": [text] * n}).to_parquet(
        f"{tmp_path}/documents.parquet"
    )
    d2 = all_queries()["d2_minhash_lsh"].spark

    monkeypatch.delenv("SPARK_GRAFT_LSH_MAX_BUCKET", raising=False)
    exact = {(r["a"], r["b"]) for r in d2(spark, str(tmp_path)).collect()}
    assert len(exact) == n * (n - 1) // 2  # the flood the cap exists for

    # explicit arg on the probe entry point
    capped = {
        (r["a"], r["b"])
        for r in d2_minhash_lsh_capped(spark, str(tmp_path), max_bucket=cap).collect()
    }
    assert len(capped) == cap * (cap - 1) // 2
    assert capped <= exact  # never invents pairs
    # deterministic: the cap keeps the smallest doc ids
    assert capped == {(a, b) for a in range(cap) for b in range(a + 1, cap)}

    # env knob reaches ONLY the probe entry point...
    monkeypatch.setenv("SPARK_GRAFT_LSH_MAX_BUCKET", str(cap))
    env_capped = {
        (r["a"], r["b"])
        for r in d2_minhash_lsh_capped(spark, str(tmp_path)).collect()
    }
    assert env_capped == capped
    # ...while the registered d2 stays exact with the env var set
    still_exact = {(r["a"], r["b"]) for r in d2(spark, str(tmp_path)).collect()}
    assert still_exact == exact

    monkeypatch.setenv("SPARK_GRAFT_LSH_MAX_BUCKET", "1")
    import pytest

    with pytest.raises(ValueError, match="cap below 2"):
        d2_minhash_lsh_capped(spark, str(tmp_path))


def test_w21_segmented_equals_window_form(spark, tmp_path):
    """The skew-mitigated segmented W21 must produce EXACTLY the window
    form's intervals — including runs that span segment boundaries
    (same state across a month edge merges into one interval) and
    duplicate-timestamp runs within one segment."""
    import datetime as dt

    import pandas as pd

    from pipeline_mf_etl_spark.queries import all_queries
    from pipeline_mf_etl_spark.queries.windows import (
        w21_scd2_intervals_segmented,
    )

    rows = []
    eid = 0
    # hot user 1: one state spanning three months (must merge across
    # two boundaries), then a flip mid-month
    for day in range(80):
        rows.append((eid, 1, dt.datetime(2024, 1, 10) + dt.timedelta(days=day),
                     "view" if day < 70 else "click", 1.0))
        eid += 1
    # user 2: duplicate timestamps with a state flip at the same ts
    t = dt.datetime(2024, 3, 5, 12)
    rows += [(eid, 2, t, "view", 1.0), (eid + 1, 2, t, "click", 1.0),
             (eid + 2, 2, t, "click", 1.0)]
    eid += 3
    # user 3: alternating states (worst case for segmentation)
    for k in range(12):
        rows.append((eid, 3, dt.datetime(2024, 2, 1) + dt.timedelta(hours=k),
                     "view" if k % 2 == 0 else "purchase", 1.0))
        eid += 1
    pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
                 ).to_parquet(f"{tmp_path}/events.parquet")

    base = all_queries()["w21_scd2_intervals"].spark(spark, str(tmp_path))
    segd = w21_scd2_intervals_segmented(spark, str(tmp_path))
    assert base.columns == segd.columns
    a = sorted(tuple(str(x) for x in r) for r in base.collect())
    b = sorted(tuple(str(x) for x in r) for r in segd.collect())
    assert a == b
    # sanity: user 1's 70-day view run really is ONE interval despite
    # crossing two month boundaries
    u1 = [r for r in segd.collect() if r["user_id"] == 1 and r["state"] == "view"]
    assert len(u1) == 1 and u1[0]["n_events"] == 70


def test_w23_minby_equals_window_form(spark, tmp_path):
    """The UNREGISTERED min_by/max_by W23 variant must equal the
    registered rank-window default exactly — including duplicate-
    timestamp bars where only the event_id tie-break makes open/close
    deterministic."""
    import datetime as dt

    import pandas as pd

    from pipeline_mf_etl_spark.queries import all_queries
    from pipeline_mf_etl_spark.queries.windows import w23_ohlc_resample_minby

    t0 = dt.datetime(2024, 3, 4, 9)
    rows = []
    eid = 0
    for day in range(21):  # three weeks
        for k in range(5):
            rows.append((eid, 1, t0 + dt.timedelta(days=day, hours=k), 10.0 + eid % 7, ))
            eid += 1
    # duplicate timestamps: open/close decided by event_id only
    t_dup = dt.datetime(2024, 3, 25, 12)
    rows += [(eid, 2, t_dup, 5.0), (eid + 1, 2, t_dup, 9.0), (eid + 2, 2, t_dup, 1.0)]
    pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]).assign(
        event_type="view"
    ).to_parquet(f"{tmp_path}/events.parquet")

    a = all_queries()["w23_ohlc_resample"].spark(spark, str(tmp_path))
    b = w23_ohlc_resample_minby(spark, str(tmp_path))
    assert a.columns == b.columns
    ra = sorted(tuple(str(x) for x in r) for r in a.collect())
    rb = sorted(tuple(str(x) for x in r) for r in b.collect())
    assert ra == rb
    u2 = [r for r in a.collect() if r["user_id"] == 2]
    assert len(u2) == 1 and (u2[0]["open"], u2[0]["close"]) == (5.0, 1.0)
