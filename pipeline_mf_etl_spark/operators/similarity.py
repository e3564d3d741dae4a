"""Similarity-search operators over embedding columns (array<float>).

Cosine is computed JVM-side with higher-order functions (zip_with +
aggregate) in float64 — no Python UDF in the hot path. Ranking uses the
ROUNDED score with an id tie-break so ordering is reproducible across
engines (raw float ranking is ulp-fragile).

Scale paths:
- brute force: queries × candidates cross join — right answer, O(Q·N);
  broadcast the query side, candidates stay partitioned.
- bucketed (IVF-style): equi-join on a coarse partition key first, then
  rank within bucket — the sub-linear plan shape used at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Exact cosine top-k per query (excluding self): broadcast queries,
    score all candidates, rank on rounded score + id tie-break.

    Norms are computed ONCE per side before the pair join (a naive
    cosine-per-pair recomputes both array folds Q·N times; the value is
    bit-identical since norm(a)*norm(b) keeps the same operation
    order, only the fold count drops from 3 to 1 per pair)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    bucket_col: str,
    k: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """IVF-style ANN: restrict scoring to the query's coarse bucket
    (equi-join on the bucket key), then exact rank within bucket."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(bucket_col).alias("bucket"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(bucket_col).alias("bucket"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def fit_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    iters: int = 5,
    sample_cap: int = 20_000,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> list[list[float]]:
    """Fit spherical k-means centroids (Lloyd's, cosine metric) on the
    driver over a deterministic HASH-ordered sample.

    Ordering by ``md5(id)`` (not by id) makes the capped sample a
    uniform draw from the corpus regardless of how the data is sorted —
    an id-ordered prefix of a corpus sorted by source/time would fit
    centroids on one unrepresentative slice. The hash order is
    engine-agnostic and RNG-free, so the fit (and every export-backed
    oracle downstream) stays reproducible; Spark executes
    orderBy+limit as TakeOrderedAndProject (per-partition top-k, no
    full sort), so the collect is bounded by ``sample_cap`` at any
    corpus size. At true 100 TB scale the same contract supports
    swapping in distributed MLlib KMeans over the hash sample;
    assignment and search stay fully distributed in :func:`ivf_topk`
    either way. Init is the first ``n_centroids`` sample vectors —
    deterministic, no RNG.
    """
    import numpy as np

    X = hash_sample_matrix(vectors, sample_cap, id_col=id_col, vec_col=vec_col)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(Xn))
    C = Xn[:k].copy()
    for _ in range(iters):
        assign = (Xn @ C.T).argmax(axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(float(np.linalg.norm(c)), 1e-12)
    return [[float(x) for x in c] for c in C]


def ivf_assign_cells(
    vectors: DataFrame,
    centroids: list[list[float]],
    n: int = 1,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, vec, centroid_id) — one row per assigned (n=1) or probed
    (n=nprobe) inverted list, by ROUNDED cosine (9 dp) with centroid-id
    ascending tiebreak.

    Map-only, same kernel shape as :func:`ivfpq_encode`: the centroid
    matrix rides in the mapInPandas closure (KB-scale, shipped with the
    task binary) and each Arrow batch ranks its rows against all
    centroids in one BLAS matmul — no join, no Exchange anywhere, the
    shape that survives a 100-TB corpus with thousands of centroids
    (where a crossJoin(centroids) + per-row window would shuffle
    corpus×n_centroids rows just to take an argmax).
    Guarded by tests/test_plans.py (no Exchange in the assignment plan).
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    fields = vectors.select(id_col, vec_col).schema.fields
    schema = StructType(list(fields) + [StructField("centroid_id", IntegerType(), False)])

    def assign(batches):
        import numpy as np

        C = np.asarray(centroids, dtype=np.float64)
        cnorm = np.linalg.norm(C, axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            # same arithmetic contract as the JVM `cosine` HOF: raw
            # float64 cosine rounded to 9 dp, ties broken by lower
            # centroid id (stable argsort on the negated score)
            sim = np.round(
                (X @ C.T) / (np.linalg.norm(X, axis=1, keepdims=True) * cnorm[None, :]),
                9,
            )
            take = min(n, len(C))
            order = np.argsort(-sim, axis=1, kind="stable")[:, :take]
            idx = np.repeat(np.arange(len(pdf)), take)
            yield type(pdf)(
                {
                    id_col: pdf[id_col].to_numpy()[idx],
                    vec_col: pdf[vec_col].to_numpy()[idx],
                    "centroid_id": order.reshape(-1).astype("int32"),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(assign, schema)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    assignments_cb=None,
) -> DataFrame:
    """IVF ANN with learned centroids: assign every candidate to its
    nearest centroid (inverted lists), probe each query's ``nprobe``
    nearest lists, exact-rerank within the probed union.

    Candidate/query assignment is :func:`ivf_assign_cells` — a genuinely
    map-only Arrow-batch stage (no Exchange); rerank scoring is JVM-side
    HOF cosine, so the only shuffles are the candidate-pair dedupe and
    the final per-query rank, exactly the shape that survives a 100×
    corpus.

    The QUERY side is broadcast (line below) — correct for the top-k-for-
    probes use case where queries ≪ corpus. Do NOT call this with
    queries == corpus: an all-pairs self-search should go through
    :func:`embedding_near_dup_pairs` (banded LSH), not a broadcast of
    the full corpus.
    """
    c = ivf_assign_cells(
        candidates.select(F.col(id_col).alias("cand_id"), vec_col),
        centroids,
        1,
        id_col="cand_id",
        vec_col=vec_col,
    ).withColumnRenamed(vec_col, "cv")
    q = ivf_assign_cells(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        centroids,
        nprobe,
        id_col="query_id",
        vec_col=vec_col,
    ).withColumnRenamed(vec_col, "qv")
    if assignments_cb is not None:
        # hook for oracle certification: persist the inverted-list
        # assignments and hand back the (read-back) frames so the rank
        # stage and an external oracle consume identical rows
        c, q = assignments_cb(c, q)

    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def embedding_near_dup_pairs_bruteforce(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — O(N²) self-join.

    Small-scale oracle baseline ONLY (recall tests); production path is
    :func:`embedding_near_dup_pairs` (LSH candidates + verify).
    """
    a = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def lsh_bands_for_threshold(
    threshold: float, rows_per_band: int, miss_target: float = 1e-9
) -> int:
    """Number of hyperplane-LSH bands so a pair AT the cosine threshold
    collides in >=1 band with probability >= 1 - miss_target.

    Per-hyperplane agreement for angle θ is 1 - θ/π (Charikar 2002,
    SimHash/random-projection LSH); a band of r bits collides with p^r,
    and missing all b bands has probability (1 - p^r)^b.
    """
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p_band = p**rows_per_band
    if p_band >= 1.0:
        return 1
    return max(1, math.ceil(math.log(miss_target) / math.log(1.0 - p_band)))


def _hyperplane_literal(dim: int, n_planes: int, seed: int) -> Column:
    """Deterministic unit Gaussian hyperplanes as a pure array literal —
    keeps the signature stage map-only (no join, nothing to shuffle)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    P = rng.standard_normal((n_planes, dim))
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    inner = ",".join(
        "array({})".format(",".join(repr(float(x)) for x in row)) for row in P
    )
    return F.expr(f"array({inner})")


def lsh_hyperplane_candidates(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    rows_per_band: int = 2,
    miss_target: float = 1e-9,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Candidate (a < b) pairs from banded random-hyperplane signatures.

    Recall: a pair AT the cosine threshold collides in >= 1 band with
    probability >= 1 - miss_target (deterministic seeded hyperplanes).

    Selectivity is governed by ``rows_per_band`` (r): each band has 2^r
    buckets, and a RANDOM pair collides per band with ~2^-r, so small r
    (needed when the exactness bound must hold at a LOW threshold, e.g.
    the oracle-checked 0.4 here) admits nearly every pair as a candidate
    — the plan is still equi-join shaped (no cartesian operator), but
    the candidate STREAM approaches N²/2 rows and the only wins over
    brute force are the oracle-checkable recall contract and the
    bucket-parallel shuffle. Genuine sub-quadratic behavior (classic LSH
    n^ρ) needs r ≈ log2(N) with a relaxed miss_target — see
    tests/test_operators.py::test_lsh_high_threshold_prunes_candidates
    for the high-threshold regime where that trade is measured.
    """
    bands = lsh_bands_for_threshold(threshold, rows_per_band, miss_target)
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = _hyperplane_literal(dim, bands * rows_per_band, seed)

    bits = F.transform(
        planes, lambda p: (dot(F.col(vec_col), p) > 0).cast("int")
    )
    # Materialize the bit signature as a COLUMN before slicing it into
    # band hashes: higher-order functions are CodegenFallback, and with
    # ``bits`` inlined into the per-band lambda the whole
    # bands×rows_per_band×dim dot-product array was re-evaluated once
    # PER BAND per row — measured 41× redundant interpreted work (~50 s
    # of the old 84 s chain at sf0.1). As a multi-referenced non-cheap
    # expression, CollapseProject keeps the projection boundary, so the
    # signature is computed exactly once per row.
    with_bits = vectors.select(F.col(id_col).alias("_id"), bits.alias("_bits"))
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.aggregate(
            F.slice(F.col("_bits"), i * rows_per_band + 1, rows_per_band),
            F.lit(0),
            lambda acc, x: acc * 2 + x,
        ),
    )
    sig = with_bits.select(
        "_id",
        F.posexplode(band_hashes).alias("band", "bhash"),
    )
    # Explicit-count repartition on the join key (guide §2): the bucket
    # self-join's OUTPUT (Σ C(bucket, 2) rows per bucket) dwarfs its
    # INPUT bytes (corpus × bands narrow rows), so AQE's byte-sized
    # coalescing — and, on the driver's single-row-group test files, the
    # unsplittable scan itself — would run the pair generation on one
    # task. Same byte-model-wrong rationale as island_repartition;
    # measured at sf0.1 (d5 feed, thr 0.4): the whole chain ran 1-wide,
    # 84 s → 7 s with the join and everything downstream 32-wide.
    from pipeline_mf_etl_spark.functions.core import island_repartition

    sig = island_repartition(sig, "band", "bhash")

    left = sig.select(F.col("_id").alias("a"), "band", "bhash")
    right = sig.select(F.col("_id").alias("b"), "band", "bhash")
    return (
        left.join(right, ["band", "bhash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    rows_per_band: int = 2,
    miss_target: float = 1e-9,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: banded-LSH candidates (see
    :func:`lsh_hyperplane_candidates` for the recall/selectivity trade)
    → exact cosine verify on the DISTINCT candidates only. The plan
    contains no cartesian operator at any parameterization; how far the
    candidate volume sits below N²/2 depends on rows_per_band vs the
    threshold.

    Reference semantics: same contract as the brute-force variant —
    all (a < b) with ROUND(cos, 6) >= threshold.

    Shape note (r14): an inline-verify variant (vectors carried through
    the band join, first-colliding-band dedup predicate instead of the
    distinct) was measured 4× SLOWER here despite one fewer exchange —
    higher-order functions are CodegenFallback, so pushing the cosine
    and the prefix-comparison into the join condition evaluates
    interpreted lambdas once per RAW collision row; the narrow
    dropDuplicates keeps the interpreted cosine at once per DISTINCT
    candidate. The actual fix was parallelism (see the explicit-count
    repartition in lsh_hyperplane_candidates)."""
    cand = lsh_hyperplane_candidates(
        vectors,
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        rows_per_band=rows_per_band,
        miss_target=miss_target,
        seed=seed,
        dim=dim,
    )
    va = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path beyond IVF:
# vectors compress to M sub-space codebook codes (here 64 dims -> 8 bytes,
# 32x), and queries score candidates with asymmetric distance (ADC): a
# per-query M x K lookup table of squared sub-distances, summed by code.
# ---------------------------------------------------------------------------
def hash_sample_matrix(
    vectors: DataFrame,
    sample_cap: int = 20_000,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
):
    """Driver-side matrix of the deterministic hash-ordered sample —
    THE sampling contract every fit in this module shares (uniform draw
    regardless of corpus ordering, RNG-free, bounded collect executed
    as TakeOrderedAndProject; see fit_ivf_centroids for the full
    rationale). One source so the cap/ordering can never diverge
    between fits, and so a caller composing several fits (IVF-PQ)
    collects the sample ONCE."""
    import numpy as np

    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(sample_cap)
        .collect()
    )
    return np.asarray([r[1] for r in rows], dtype=np.float64)


def fit_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample_cap: int = 20_000,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means codebooks (M x K x D/M), fit on the
    driver over the same deterministic hash-ordered sample contract as
    :func:`fit_ivf_centroids` (uniform draw, RNG-free, bounded collect;
    TakeOrderedAndProject keeps the sample pull per-partition top-k).
    Euclidean metric — PQ quantizes raw coordinates and ADC approximates
    squared L2. Init is the first ``ksub`` sample sub-vectors."""
    return _subspace_kmeans(
        hash_sample_matrix(vectors, sample_cap, id_col=id_col, vec_col=vec_col),
        m,
        ksub,
        iters,
    )


def _subspace_kmeans(X, m: int, ksub: int, iters: int) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means over a driver-side matrix (shared by
    the raw-vector and residual codebook fits). Deterministic: init is
    the first ``ksub`` rows of each subspace."""
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    ds = d // m
    books: list[list[list[float]]] = []
    for mm in range(m):
        sub = X[:, mm * ds : (mm + 1) * ds]
        k = min(ksub, len(sub))
        C = sub[:k].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
            assign = d2.argmin(axis=1)
            for j in range(k):
                members = sub[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def fit_coarse_centroids_l2(
    vectors: DataFrame,
    n_centroids: int = 8,
    iters: int = 8,
    sample_cap: int = 20_000,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    sample_x=None,
) -> list[list[float]]:
    """Euclidean Lloyd's coarse centroids for IVF-PQ (the spherical
    cosine fit of :func:`fit_ivf_centroids` would mismatch the L2
    residual metric ADC scores in). Same deterministic hash-ordered
    sample contract; implemented as the m=1 case of the subspace
    k-means."""
    X = sample_x if sample_x is not None else hash_sample_matrix(
        vectors, sample_cap, id_col=id_col, vec_col=vec_col
    )
    return _subspace_kmeans(X, 1, n_centroids, iters)[0]


def fit_residual_codebooks(
    vectors: DataFrame,
    centroids: list[list[float]],
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample_cap: int = 20_000,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    sample_x=None,
) -> list[list[list[float]]]:
    """IVF-PQ codebooks fit on RESIDUALS (sample vector minus its
    nearest coarse centroid) — residual magnitudes are what in-list ADC
    must resolve, so quantizing raw coordinates would waste the code
    budget on the part the coarse centroid already explains. Same
    deterministic hash-ordered sample contract as the other fits."""
    import numpy as np

    X = sample_x if sample_x is not None else hash_sample_matrix(
        vectors, sample_cap, id_col=id_col, vec_col=vec_col
    )
    CENT = np.asarray(centroids, dtype=np.float64)
    assign = ((X[:, None, :] - CENT[None, :, :]) ** 2).sum(axis=-1).argmin(axis=1)
    return _subspace_kmeans(X - CENT[assign], m, ksub, iters)


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, codes array<int>) — map-only PQ encoding: the codebooks ride
    to every task inside the Arrow-batched closure (M·K·D/M floats, a
    few KB) and each batch assigns codes with one vectorized NumPy
    argmin per subspace. No shuffle, no driver round-trip; the encode
    stage scales as a pure scan like IVF assignment."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    id_field = vectors.select(id_col).schema.fields[0]
    schema = StructType(
        [id_field, StructField("codes", ArrayType(IntegerType(), False), False)]
    )
    m = len(codebooks)

    def encode(batches):
        import numpy as np

        C = [np.asarray(b, dtype=np.float64) for b in codebooks]
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            # fail loudly like the fit does — silent ds truncation would
            # drop trailing dims from every ADC score
            assert X.shape[1] % m == 0, f"dim {X.shape[1]} not divisible by m={m}"
            ds = X.shape[1] // m
            codes = np.empty((len(X), m), dtype=np.int32)
            for mm in range(m):
                sub = X[:, mm * ds : (mm + 1) * ds]
                d2 = ((sub[:, None, :] - C[mm][None, :, :]) ** 2).sum(axis=-1)
                codes[:, mm] = d2.argmin(axis=1)
            yield type(pdf)({id_field.name: pdf[id_col], "codes": list(codes.tolist())})

    return vectors.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(query_id, luts array<array<double>>) — the per-query ADC lookup
    tables: luts[m][k] = squared L2 between the query's m-th sub-vector
    and codebook centroid k. Built on the driver (queries are few by
    contract); each LUT is M·K doubles."""
    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    spark = queries.sparkSession
    C = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(C)
    rows = queries.select(id_col, vec_col).collect()
    out = []
    for r in rows:
        qv = np.asarray(r[1], dtype=np.float64)
        ds = len(qv) // m
        luts = [
            [float(((qv[mm * ds : (mm + 1) * ds] - c) ** 2).sum()) for c in C[mm]]
            for mm in range(m)
        ]
        out.append((r[0], luts))
    # query_id keeps the INPUT id type — a hardcoded BIGINT would make
    # the id_col keyword a trap for any non-long id column
    schema = StructType(
        [
            StructField("query_id", queries.select(id_col).schema.fields[0].dataType),
            StructField(
                "luts", ArrayType(ArrayType(DoubleType(), False), False), False
            ),
        ]
    )
    return spark.createDataFrame(out, schema)


def _adc_rank_tail(joined: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared ADC-score + rank tail of :func:`pq_topk` / :func:`ivfpq_topk`
    (the two differ ONLY in how codes meet LUTs): score = sum over
    subspaces of luts[m][codes[m]] via zip_with/aggregate (JVM-side),
    then one per-query rank shuffle on the 6-dp-rounded distance with
    an id tie-break (ascending — smaller ADC is closer)."""
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("luts"), lambda cd, l: F.element_at(l, cd + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.filter(F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("cand_id"),
        F.round(adc, 6).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adc", "rank")
    )


def pq_topk(
    codes: DataFrame,
    luts: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k per query over the ENTIRE encoded corpus: the LUT
    table is broadcast (rows = queries) against every code row, so the
    only shuffle is the final per-query rank — see
    :func:`_adc_rank_tail` for the shared scoring/ranking contract."""
    return _adc_rank_tail(codes.crossJoin(F.broadcast(luts)), k, id_col)


# ---------------------------------------------------------------------------
# IVF-PQ — the production big-corpus ANN composition: IVF coarse lists
# bound the search to nprobe inverted lists, PQ codes on the RESIDUAL
# (vector minus its list centroid) give compact in-list storage, and
# queries score candidates with a per-(query, probed-list) ADC table
# built from the query's residual against that list's centroid.
# ---------------------------------------------------------------------------
def ivfpq_encode(
    vectors: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, centroid_id, codes) — map-only: each Arrow batch assigns the
    nearest coarse centroid (L2) and PQ-encodes the residual. Both the
    centroid table and the codebooks ride in the closure (KB-scale);
    no shuffle anywhere."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    id_field = vectors.select(id_col).schema.fields[0]
    schema = StructType(
        [
            id_field,
            StructField("centroid_id", IntegerType(), False),
            StructField("codes", ArrayType(IntegerType(), False), False),
        ]
    )
    m = len(codebooks)

    def encode(batches):
        import numpy as np

        CENT = np.asarray(centroids, dtype=np.float64)
        C = [np.asarray(b, dtype=np.float64) for b in codebooks]
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            # fail loudly like the fit does — silent ds truncation would
            # drop trailing dims from every ADC score
            assert X.shape[1] % m == 0, f"dim {X.shape[1]} not divisible by m={m}"
            d2c = ((X[:, None, :] - CENT[None, :, :]) ** 2).sum(axis=-1)
            cell = d2c.argmin(axis=1)
            R = X - CENT[cell]
            ds = X.shape[1] // m
            codes = np.empty((len(X), m), dtype=np.int32)
            for mm in range(m):
                sub = R[:, mm * ds : (mm + 1) * ds]
                d2 = ((sub[:, None, :] - C[mm][None, :, :]) ** 2).sum(axis=-1)
                codes[:, mm] = d2.argmin(axis=1)
            yield type(pdf)(
                {
                    id_field.name: pdf[id_col],
                    "centroid_id": cell.astype("int32"),
                    "codes": list(codes.tolist()),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(encode, schema)


def ivfpq_query_luts(
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(query_id, centroid_id, luts) — one row per probed list: the
    query's ``nprobe`` nearest coarse lists (L2, centroid-id tiebreak)
    each carry the ADC table of the query RESIDUAL against that list's
    centroid. Driver-built (queries are few by contract)."""
    import numpy as np

    spark = queries.sparkSession
    CENT = np.asarray(centroids, dtype=np.float64)
    C = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(C)
    out = []
    for r in queries.select(id_col, vec_col).collect():
        qv = np.asarray(r[1], dtype=np.float64)
        d2c = ((qv[None, :] - CENT) ** 2).sum(axis=-1)
        order = sorted(range(len(CENT)), key=lambda i: (d2c[i], i))[:nprobe]
        ds = len(qv) // m
        for cell in order:
            res = qv - CENT[cell]
            luts = [
                [
                    float(((res[mm * ds : (mm + 1) * ds] - c) ** 2).sum())
                    for c in C[mm]
                ]
                for mm in range(m)
            ]
            out.append((r[0], int(cell), luts))
    # query_id keeps the INPUT id type (see pq_luts)
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("query_id", queries.select(id_col).schema.fields[0].dataType),
            StructField("centroid_id", IntegerType(), False),
            StructField(
                "luts", ArrayType(ArrayType(DoubleType(), False), False), False
            ),
        ]
    )
    return spark.createDataFrame(out, schema)


def ivfpq_topk(
    codes: DataFrame,
    luts: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k restricted to the probed lists: an EQUI-join on
    centroid_id (broadcast LUT side — rows = queries × nprobe) prunes
    every unprobed candidate before any scoring, then the same
    zip_with/aggregate ADC sum and one per-query rank shuffle as
    :func:`pq_topk`. This is the composition that holds at corpus
    scale: storage is codes-only (32x), and compute per query is
    |probed lists| · ADC, not corpus-wide. Scoring/ranking is the same
    :func:`_adc_rank_tail` contract as plain PQ."""
    return _adc_rank_tail(codes.join(F.broadcast(luts), "centroid_id"), k, id_col)


def semantic_dup_pairs_blas(
    emb: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cell_col: str = "centroid_id",
) -> DataFrame:
    """Within-cell high-cosine pairs via ONE BLAS matmul per cell — the
    production verify kernel for semantic dedup (SemDeDup): after the
    map-only cell assignment, each cell's member matrix multiplies
    against itself (``Xn @ Xn.T``) in an Arrow-batched applyInPandas,
    ~100× less per-pair overhead than an element-lambda dot in codegen.

    This IS the certified e7 verify path (round 6): the kernel rounds
    each pair cosine to 6 dp before thresholding, the same convention
    ivf_assign_cells uses, so the oracle's ``ROUND(list_dot_product,
    6)`` compares on the identical grid — BLAS blocks the summation
    differently than a sequential fold, but a flip needs ~1e-15 drift
    to straddle a 1e-6 grid line. tests/test_operators.py additionally
    pins set-equality against the element-lambda JVM-HOF dot sequence
    on the real corpus. The k ∝ N cell-size invariant keeps each
    matmul bounded at any corpus size.
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(cell_col, IntegerType(), False),
            StructField("pa", LongType(), False),
            StructField("pb", LongType(), False),
        ]
    )

    def pairs(pdf):
        import numpy as np
        import pandas as pd

        X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = np.round(Xn @ Xn.T, 6)
        ai, bi = np.nonzero(np.triu(S >= threshold, k=1))
        pa, pb = ids[ai], ids[bi]
        swap = pa > pb
        pa[swap], pb[swap] = pb[swap], pa[swap]
        return pd.DataFrame(
            {
                cell_col: np.full(len(pa), int(pdf[cell_col].iloc[0]), dtype="int32"),
                "pa": pa,
                "pb": pb,
            }
        )

    from pipeline_mf_etl_spark.functions.core import island_repartition

    # explicit-count pre-partition on the cell key: the BLAS cell matmul
    # is the expensive stage, and AQE's byte-based coalescing otherwise
    # collapses it onto one task at small scale (see island_repartition)
    return island_repartition(
        emb.select(cell_col, id_col, vec_col), cell_col
    ).groupBy(cell_col).applyInPandas(pairs, out_schema)
