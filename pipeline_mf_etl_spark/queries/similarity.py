"""Similarity-search queries over the embeddings table.

Oracles compute cosine with the same dot/(norm·norm) formula (DuckDB
list_dot_product) and rank on the ROUNDED score with an id tie-break, so
ordering matches Spark bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.similarity import (
    brute_force_topk,
    bucketed_topk,
    embedding_near_dup_pairs,
    fit_ivf_centroids,
    ivf_topk,
)
from pipeline_mf_etl_spark.queries.export import export_frame, export_glob
from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.sources.readers import fan_out, load_table

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


# ---------------------------------------------------------------------------
# Brute-force exact cosine top-k — the ANN baseline.
# ---------------------------------------------------------------------------
@query(
    "e1_ann_bruteforce",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM v WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, c.vec_id AS cand_id,
               ROUND({_COS.format(a="q.qv", b="c.emb")}, 6) AS cos
        FROM q JOIN v c ON c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def e1_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 8 query vectors against the whole corpus."""
    v = _vectors(spark, sf_dir)
    return brute_force_topk(v.filter(F.col("vec_id") < 8), v, k=5)


# ---------------------------------------------------------------------------
# Bucketed IVF-style ANN: coarse partition (label) restricts the search.
# ---------------------------------------------------------------------------
@query(
    "e2_ann_bucketed",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS bucket, emb AS qv FROM v WHERE vec_id < 8),
    scored AS (
        SELECT q.query_id, c.vec_id AS cand_id,
               ROUND({_COS.format(a="q.qv", b="c.emb")}, 6) AS cos
        FROM q JOIN v c ON c.label = q.bucket AND c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def e2_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed top-3: search only the query's coarse bucket."""
    v = _vectors(spark, sf_dir)
    return bucketed_topk(v.filter(F.col("vec_id") < 8), v, "label", k=3)


# ---------------------------------------------------------------------------
# True IVF ANN: learned centroids + nprobe probing. The centroid fit is an
# iterative driver-side procedure (deterministic, no RNG) that SQL cannot
# express, so the driver records the rows-only check; recall vs the e1
# brute-force baseline is asserted in tests/test_operators.py.
# ---------------------------------------------------------------------------
@query(
    "e4_ann_ivf",
    eager=True,
    oracle=f"""
    WITH c AS (SELECT * FROM read_parquet('{export_glob("e4_cand_cells")}')),
    q AS (SELECT * FROM read_parquet('{export_glob("e4_query_cells")}')),
    scored AS (
        SELECT DISTINCT q.query_id, c.cand_id,
               ROUND({_COS.format(a="q.qv", b="c.cv")}, 6) AS cos
        FROM c JOIN q USING (centroid_id)
        WHERE c.cand_id <> q.query_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, cos, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def e4_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 for 8 query vectors: spherical k-means inverted lists
    (driver fit on a bounded sample), nprobe=2 probing, exact rerank
    within the probed lists — map-only assignment, one final shuffle.
    The inverted-list assignments are persisted so everything after the
    centroid fit (probing, rerank, top-k) is oracle-checked."""
    v = _vectors(spark, sf_dir)
    centroids = fit_ivf_centroids(v, n_centroids=8, iters=5)

    def persist_assignments(c: DataFrame, q: DataFrame):
        cp = export_frame(
            c.select("cand_id", "cv", "centroid_id"), spark, sf_dir, "e4_cand_cells"
        )
        qp = export_frame(
            q.select("query_id", "qv", "centroid_id"), spark, sf_dir, "e4_query_cells"
        )
        return cp, qp

    return ivf_topk(
        v.filter(F.col("vec_id") < 8),
        v,
        centroids,
        k=5,
        nprobe=2,
        assignments_cb=persist_assignments,
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (dedup family, embedding modality).
# ---------------------------------------------------------------------------
@query(
    "e3_embedding_neardup",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND({_COS.format(a="a.emb", b="b.emb")}, 6) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND({_COS.format(a="a.emb", b="b.emb")}, 6) >= 0.4
    """,
)
def e3_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= 0.4): random-hyperplane
    LSH candidate generation + exact cosine verify on candidates only.
    The plan is equi-join shaped (no cartesian operator); at this LOW
    threshold the exact-recall bound forces small bands, so the candidate
    stream itself approaches all pairs — the sub-quadratic regime needs
    high thresholds + wide bands (see operators/similarity.py and the
    pruning test). Vectors are 64-dim here. fan_out (r14): the bit-
    signature scan is the heavy map side of this chain and the driver's
    single-row-group embeddings file pins it to one core (no-op at
    production split counts)."""
    v = _vectors(spark, sf_dir)
    v = fan_out(v)
    return embedding_near_dup_pairs(v, 0.4, dim=64)


# ---------------------------------------------------------------------------
# Product-quantization ANN — the memory-bound scale path: 64-dim vectors
# compress to 8 one-byte codes (32x), queries score by ADC lookup. The
# codebook fit is the same driver-side deterministic procedure as IVF,
# so codes + LUTs are persisted and everything downstream (ADC scoring,
# ranking, top-k) is oracle-checked.
# ---------------------------------------------------------------------------
_PQ_M = 8


@query(
    "e5_ann_pq",
    eager=True,
    oracle=f"""
    WITH c AS (SELECT * FROM read_parquet('{export_glob("e5_codes")}')),
    q AS (SELECT * FROM read_parquet('{export_glob("e5_luts")}')),
    scored AS (
        SELECT q.query_id, c.vec_id AS cand_id,
               ROUND(list_sum(list_transform(range(1, {_PQ_M + 1}),
                   i -> q.luts[i][c.codes[i] + 1])), 6) AS adc
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc ASC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, adc, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def e5_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-5 for 8 query vectors: per-subspace k-means codebooks
    (8 subspaces x 16 centroids, driver fit on the bounded hash
    sample), map-only Arrow-batched encoding, broadcast per-query LUTs,
    zip_with/aggregate ADC scoring — one final rank shuffle. Codes and
    LUTs are persisted so both engines score identical inputs; ranking
    uses the rounded ADC with an id tie-break. EAGER: fits + encodes +
    exports at build time."""
    from pipeline_mf_etl_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
        pq_luts,
        pq_topk,
    )

    v = _vectors(spark, sf_dir)
    books = fit_pq_codebooks(v, m=_PQ_M, ksub=16, iters=8)
    codes = export_frame(pq_encode(v, books), spark, sf_dir, "e5_codes")
    luts = export_frame(
        pq_luts(v.filter(F.col("vec_id") < 8), books), spark, sf_dir, "e5_luts"
    )
    return pq_topk(codes, luts, k=5)


# ---------------------------------------------------------------------------
# IVF-PQ — the production big-corpus composition: coarse inverted lists
# bound the search, PQ-on-residuals gives 32x in-list storage, ADC
# scores only the probed lists.
# ---------------------------------------------------------------------------
@query(
    "e6_ann_ivfpq",
    eager=True,
    oracle=f"""
    WITH c AS (SELECT * FROM read_parquet('{export_glob("e6_codes")}')),
    q AS (SELECT * FROM read_parquet('{export_glob("e6_luts")}')),
    scored AS (
        SELECT q.query_id, c.vec_id AS cand_id,
               ROUND(list_sum(list_transform(range(1, {_PQ_M + 1}),
                   i -> q.luts[i][c.codes[i] + 1])), 6) AS adc
        FROM c JOIN q USING (centroid_id)
        WHERE c.vec_id <> q.query_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc ASC, cand_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, adc, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def e6_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 for 8 query vectors: L2 coarse centroids (8 lists)
    + PQ codebooks fit on RESIDUALS, one map-only Arrow pass assigning
    list + codes, per-(query, probed-list) residual ADC tables
    (nprobe=2) equi-joined on centroid_id so unprobed lists never score
    — the composition that holds at corpus scale. Every candidate lives
    in exactly one list, so the probe union needs no dedupe. Codes and
    LUTs are persisted; scoring/ranking is oracle-checked. EAGER: fits
    + encodes + exports at build time."""
    from pipeline_mf_etl_spark.operators.similarity import (
        fit_coarse_centroids_l2,
        fit_residual_codebooks,
        hash_sample_matrix,
        ivfpq_encode,
        ivfpq_query_luts,
        ivfpq_topk,
    )

    v = _vectors(spark, sf_dir)
    # ONE sample collect feeds both fits — they share the identical
    # hash-ordered draw by contract, so collecting twice only doubled
    # the TakeOrderedAndProject scans
    sample = hash_sample_matrix(v)
    coarse = fit_coarse_centroids_l2(v, n_centroids=8, iters=8, sample_x=sample)
    books = fit_residual_codebooks(
        v, coarse, m=_PQ_M, ksub=16, iters=8, sample_x=sample
    )
    codes = export_frame(ivfpq_encode(v, coarse, books), spark, sf_dir, "e6_codes")
    luts = export_frame(
        ivfpq_query_luts(v.filter(F.col("vec_id") < 8), coarse, books, nprobe=2),
        spark,
        sf_dir,
        "e6_luts",
    )
    return ivfpq_topk(codes, luts, k=5)


# ---------------------------------------------------------------------------
# E7: semantic deduplication (SemDeDup, Abbas et al. 2023 — public):
# cluster the embedding space with spherical k-means, then find
# high-cosine pairs ONLY within each cluster and keep one
# representative per duplicate relation. The design point that makes
# this the 100 TB shape: k grows with the corpus so the expected cell
# stays bounded (~N/k vectors), and the quadratic verify is confined
# to cells — total work O(N²/k), never a global all-pairs. Pairs that
# straddle cell boundaries are the documented recall trade (same trade
# the paper makes); e3's LSH path is the alternative when global
# recall at a fixed threshold is required.
# ---------------------------------------------------------------------------
_E7_TAU = 0.4
#: k scales with the corpus (k ≈ N / _E7_CELL_TARGET, floored at 8) so
#: the expected cell stays ~_E7_CELL_TARGET vectors no matter how big
#: the corpus gets — THE SemDeDup scale invariant: with k fixed, the
#: within-cell verify grows O(N²); with k ∝ N it stays O(N·cell).
#: At the oracle sf (500 vectors) the floor keeps k = 8, so oracle
#: results are unchanged by corpus-size-driven k elsewhere.
_E7_K_MIN = 8
_E7_K_MAX = 4096
_E7_CELL_TARGET = 650


@query(
    "e7_semantic_dedup",
    eager=True,
    oracle=f"""
    WITH a AS (SELECT * FROM read_parquet('{export_glob("e7_assign")}')),
    v AS (
        SELECT a.vec_id, a.centroid_id, CAST(e.embedding AS DOUBLE[]) AS emb
        FROM a JOIN embeddings e USING (vec_id)
    ),
    nv AS (
        SELECT vec_id, centroid_id,
               list_transform(emb,
                   x -> x / sqrt(list_dot_product(emb, emb))) AS nv
        FROM v
    ),
    pairs AS (
        SELECT x.centroid_id, x.vec_id AS pa, y.vec_id AS pb
        FROM nv x JOIN nv y
          ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
        WHERE ROUND(list_dot_product(x.nv, y.nv), 6) >= {_E7_TAU}
    ),
    dropped AS (SELECT DISTINCT centroid_id, pb AS vec_id FROM pairs),
    per AS (
        SELECT v.centroid_id, COUNT(*) AS n_vecs, COUNT(d.vec_id) AS n_dropped
        FROM v LEFT JOIN dropped d
          ON v.centroid_id = d.centroid_id AND v.vec_id = d.vec_id
        GROUP BY v.centroid_id
    ),
    np AS (SELECT centroid_id, COUNT(*) AS n_pairs FROM pairs GROUP BY centroid_id)
    SELECT CAST(per.centroid_id AS INTEGER) AS cluster,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_dup_pairs,
           CAST(n_dropped AS BIGINT) AS n_dropped,
           CAST(n_vecs - n_dropped AS BIGINT) AS n_kept
    FROM per LEFT JOIN np ON per.centroid_id = np.centroid_id
    """,
)
def e7_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster semantic-dedup rollup: cell size, within-cell dup
    pairs (cosine >= 0.4 on the ROUNDED score), dropped count under the
    keep-first policy (a vector is dropped iff a smaller-id cell-mate
    matches it — the paper notes the keeper choice barely moves
    downstream quality, so the engine uses the deterministic one), and
    kept count. Assignment is the map-only ivf_assign_cells kernel
    (no Exchange). The within-cell verify is the PRODUCTION BLAS
    kernel (semantic_dup_pairs_blas): one Xn@Xn.T matmul per cell in
    an Arrow-batched applyInPandas, grouped equi-shaped on
    centroid_id — measured at 3.88 s vs the element-lambda HOF dot's
    171.78 s at the 16× probe (≈44×), and 0.04-of-linear growth at
    64× (SCALE.md "r7 probes"); the HOF path remains
    set-equality-pinned to this kernel in tests/test_operators.py.
    Cross-engine determinism
    follows the ivf_assign_cells convention: the kernel rounds each
    pair cosine to 6 dp before thresholding and the oracle compares
    ROUND(list_dot_product, 6) — BLAS blocks the summation differently
    than a sequential fold, but a flip needs ~1e-15 drift to straddle
    a 1e-6 grid line. Assignments are persisted so both engines dedupe
    the exact same partition of the space. EAGER: fits + exports at
    build time."""
    from pipeline_mf_etl_spark.operators.similarity import (
        ivf_assign_cells,
        semantic_dup_pairs_blas,
    )

    v = _vectors(spark, sf_dir)
    n_vecs = v.count()
    k = max(_E7_K_MIN, min(_E7_K_MAX, n_vecs // _E7_CELL_TARGET))
    cents = fit_ivf_centroids(v, n_centroids=k, iters=5)
    assign = export_frame(
        ivf_assign_cells(v, cents).select(
            "vec_id", F.col("centroid_id").cast("int").alias("centroid_id")
        ),
        spark,
        sf_dir,
        "e7_assign",
    )
    emb = assign.join(v.select("vec_id", "v"), "vec_id")
    pairs = semantic_dup_pairs_blas(emb, _E7_TAU).select("centroid_id", "pa", "pb")
    dropped = pairs.select("centroid_id", F.col("pb").alias("vec_id")).distinct()
    per = (
        assign.join(dropped.withColumn("is_dropped", F.lit(1)), ["centroid_id", "vec_id"], "left")
        .groupBy("centroid_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0))).alias("n_dropped"),
        )
    )
    npairs = pairs.groupBy("centroid_id").agg(F.count("*").alias("n_dup_pairs"))
    return per.join(npairs, "centroid_id", "left").select(
        F.col("centroid_id").cast("int").alias("cluster"),
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.coalesce(F.col("n_dup_pairs"), F.lit(0)).cast("bigint").alias("n_dup_pairs"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        (F.col("n_vecs") - F.col("n_dropped")).cast("bigint").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# E8: distributed PCA — the dimensionality-reduction step before ANN
# indexing / semantic dedup. Fit is one corpus pass of per-partition
# Gram partials (operators/pca.py); the persisted component matrix lets
# the oracle replay the exact map-only projection with list_dot_product.
# ---------------------------------------------------------------------------
@query(
    "e8_pca_project",
    eager=True,
    oracle=f"""
    SELECT e.vec_id, c.pc_idx,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.weights)
                 - c.bias, 6) AS proj
    FROM embeddings e
    CROSS JOIN read_parquet('{export_glob("e8_components")}') c
    """,
)
def e8_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 principal-component projections of every embedding
    (centering folded into a per-component bias). Components are fit
    distributively (partition Gram partials, driver eigh) and persisted
    so both engines project with the same matrix."""
    from pipeline_mf_etl_spark.operators.pca import (
        components_frame,
        fit_pca,
        pca_project,
    )

    v = _vectors(spark, sf_dir)
    w, bias, eigvals = fit_pca(v, q=8)
    comps = export_frame(
        components_frame(spark, w, bias, eigvals), spark, sf_dir, "e8_components"
    )
    return pca_project(v, comps.select("pc_idx", "weights", "bias"))
