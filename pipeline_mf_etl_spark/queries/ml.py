"""Research/ML operator family (SURVEY.md §2.8 M4-M8, M20) on MLlib.

The reference fits sklearn KMeans/GMM on a driver-collected matrix
(research/clustering.py:121-182); here the fit is distributed MLlib on
the ``embeddings`` table (array<float> → Vector via ``array_to_vector``,
no Python in the iteration loop). Cluster labels are
permutation-unstable across implementations (SURVEY.md §7.5), so every
output is label-invariant: size-ordered cluster profiles, quality
metrics, ARI against the ground-truth ``label`` column — never raw ids.

sklearn/hmmlearn are not available in this environment; HDBSCAN (M6)
raises NotImplementedError behind an import gate exactly as the
reference treats it as optional (research/clustering.py:184-203).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.queries.registry import query
from pipeline_mf_etl_spark.sources.readers import load_table

_SEED = 42
_K = 10

# Model predictions are persisted via the shared export helper so the
# DuckDB oracle can verify the downstream relational algebra (profiles,
# ARI, per-state rollups) over the exact same label assignments the
# Spark side aggregates — see queries/export.py for the rationale.
from pipeline_mf_etl_spark.queries.export import export_frame as _export  # noqa: E402
from pipeline_mf_etl_spark.queries.export import export_glob as _export_glob  # noqa: E402


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )


def _kmeans_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans

    vec = _vectors(spark, sf_dir)
    model = KMeans(k=_K, seed=_SEED, maxIter=40, tol=1e-6).fit(vec)
    return model.transform(vec)


# ---------------------------------------------------------------------------
# M4: KMeans clustering — label-invariant cluster profile
# (reference research/clustering.py:121-145)
# ---------------------------------------------------------------------------
@query(
    "m4_kmeans_profile",
    eager=True,
    oracle=f"""
    WITH cell AS (
        SELECT prediction, label, COUNT(*) AS cnt
        FROM read_parquet('{_export_glob("m4_pred")}')
        GROUP BY prediction, label
    ), top AS (
        SELECT prediction,
               CAST(MAX(cnt) AS BIGINT) AS top_label_n,
               CAST(SUM(cnt) AS BIGINT) AS n
        FROM cell GROUP BY prediction
    )
    SELECT n AS cluster_size, ROUND(top_label_n / n, 4) AS purity
    FROM top ORDER BY cluster_size DESC, purity DESC
    """,
)
def m4_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-ordered KMeans cluster profile (sizes + majority true label
    share) — invariant to cluster-id permutation. Labels are persisted
    to parquet and read back so the profile rollup is oracle-checked
    over the exact assignments."""
    pred = _export(
        _kmeans_predictions(spark, sf_dir).select(
            "vec_id", "label", F.col("prediction").cast("int").alias("prediction")
        ),
        spark,
        sf_dir,
        "m4_pred",
    )
    # majority true-label share per cluster, via a label×cluster rollup
    cell = pred.groupBy("prediction", "label").count()
    top = cell.groupBy("prediction").agg(
        F.max("count").alias("top_label_n"), F.sum("count").alias("n")
    )
    return (
        top.select(
            F.col("n").cast("long").alias("cluster_size"),
            F.round(F.col("top_label_n") / F.col("n"), 4).alias("purity"),
        )
        .orderBy(F.desc("cluster_size"), F.desc("purity"))
    )


# ---------------------------------------------------------------------------
# M7: cluster quality metrics (reference research/clustering.py:31-71)
# ---------------------------------------------------------------------------
@query(
    "m7_cluster_quality",
    eager=True,
    oracle=f"""
    WITH pred AS (SELECT * FROM read_parquet('{_export_glob("m7_pred")}')),
    pts AS (
        SELECT p.vec_id, p.prediction, CAST(e.embedding AS DOUBLE[]) AS v
        FROM pred p JOIN embeddings e USING (vec_id)
    ), expl AS (
        SELECT prediction, generate_subscripts(v, 1) AS pos, unnest(v) AS x
        FROM pts
    ), means AS (
        SELECT prediction AS cluster, list(m ORDER BY pos) AS mv
        FROM (SELECT prediction, pos, AVG(x) AS m FROM expl GROUP BY 1, 2)
        GROUP BY prediction
    ), pairs AS (
        SELECT pts.vec_id, pts.prediction, means.cluster,
               ROUND(list_dot_product(v, v) - 2 * list_dot_product(v, mv)
                     + list_dot_product(mv, mv), 9) AS d2
        FROM pts CROSS JOIN means
    ), per_point AS (
        SELECT vec_id,
               MAX(CASE WHEN prediction = cluster THEN d2 END) AS a2,
               MIN(CASE WHEN prediction <> cluster THEN d2 END) AS b2
        FROM pairs GROUP BY vec_id
    )
    SELECT (SELECT CAST(COUNT(DISTINCT prediction) AS INT) FROM pred) AS k,
           ROUND(AVG(CASE WHEN GREATEST(sqrt(a2), sqrt(b2)) = 0 THEN 0.0
                          ELSE (sqrt(b2) - sqrt(a2))
                               / GREATEST(sqrt(a2), sqrt(b2)) END), 6)
               AS silhouette_simplified,
           ROUND(SUM(a2), 3) AS within_sse
    FROM per_point
    """,
)
def m7_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette + within-cluster SSE for the M4 fit,
    computed DECLARATIVELY over the full corpus: distances go to
    cluster MEANS (the simplified-silhouette formulation), so both the
    score and the SSE are plain aggregates over the persisted
    assignments — distributed (no subsampled evaluator black box; the
    reference subsamples sklearn silhouette to 200k rows,
    research/clustering.py:58-64) and fully oracle-checked. Squared
    distances are rounded to 9 dp on both engines before the min/ratio
    so accumulation-order ulps cannot flip the nearest-other-cluster
    choice."""
    pred = _export(
        _kmeans_predictions(spark, sf_dir).select(
            "vec_id", F.col("prediction").cast("int").alias("prediction")
        ),
        spark,
        sf_dir,
        "m7_pred",
    )
    emb = load_table(spark, sf_dir, "embeddings")
    pts = pred.join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        "vec_id",
    )
    expl = pts.select("prediction", F.posexplode("v").alias("pos", "x"))
    means = (
        expl.groupBy("prediction", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("prediction")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("mv")
        )
        .select(F.col("prediction").alias("cluster"), "mv")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    d2 = F.round(
        _dot(F.col("v"), F.col("v"))
        - 2 * _dot(F.col("v"), F.col("mv"))
        + _dot(F.col("mv"), F.col("mv")),
        9,
    )
    pairs = pts.crossJoin(F.broadcast(means)).select(
        "vec_id", "prediction", "cluster", d2.alias("d2")
    )
    per_point = pairs.groupBy("vec_id").agg(
        F.max(F.when(F.col("prediction") == F.col("cluster"), F.col("d2"))).alias("a2"),
        F.min(F.when(F.col("prediction") != F.col("cluster"), F.col("d2"))).alias("b2"),
    )
    a, b = F.sqrt("a2"), F.sqrt("b2")
    s = F.when(F.greatest(a, b) == 0, 0.0).otherwise((b - a) / F.greatest(a, b))
    k_val = pred.select(F.countDistinct("prediction")).collect()[0][0]
    return per_point.agg(
        F.lit(int(k_val)).cast("int").alias("k"),
        F.round(F.avg(s), 6).alias("silhouette_simplified"),
        F.round(F.sum("a2"), 3).alias("within_sse"),
    )


# ---------------------------------------------------------------------------
# M5: Gaussian mixture — weights + mean assignment entropy
# (reference research/clustering.py:147-182)
# ---------------------------------------------------------------------------
@query(
    "m5_gmm_mixture",
    eager=True,
    oracle=f"""
    SELECT COUNT(*) AS cluster_size,
           ROUND(AVG(p_max), 6) AS mean_p_max,
           ROUND(AVG(entropy), 6) AS mean_entropy
    FROM read_parquet('{_export_glob("m5_probs")}')
    GROUP BY prediction
    ORDER BY cluster_size DESC, mean_p_max
    """,
)
def m5_gmm_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GMM mixture weights (sorted) with per-cluster mean max-probability
    and mean assignment entropy −Σ p·log p, computed from the probability
    vector with JVM-side vector ops. Per-row (prediction, p_max, entropy)
    is persisted so the per-cluster rollup is oracle-checked."""
    from pyspark.ml.clustering import GaussianMixture
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import vector_to_array

    vec = _vectors(spark, sf_dir)
    # MLlib GMM fits FULL covariance matrices; at 64 dims with few rows
    # per component they go numerically non-PSD. Project to 8 principal
    # components first (the reference's diag-covariance trick served the
    # same purpose, research/clustering.py:147-182).
    pca = PCA(k=8, inputCol="features", outputCol="pca").fit(vec)
    red = pca.transform(vec).select("vec_id", "label", F.col("pca").alias("features"))
    gmm = GaussianMixture(k=5, seed=_SEED, maxIter=60, tol=1e-4).fit(red)
    pred = gmm.transform(red)
    probs = pred.select(
        "prediction", vector_to_array(F.col("probability")).alias("p")
    )
    ent = F.aggregate(
        F.filter(F.col("p"), lambda x: x > 1e-12),
        F.lit(0.0),
        lambda acc, x: acc - x * F.log(x),
    )
    per_row = _export(
        probs.select(
            F.col("prediction").cast("int").alias("prediction"),
            F.array_max("p").alias("p_max"),
            ent.alias("entropy"),
        ),
        spark,
        sf_dir,
        "m5_probs",
    )
    per_cluster = per_row.groupBy("prediction").agg(
        F.count("*").alias("cluster_size"),
        F.round(F.avg("p_max"), 6).alias("mean_p_max"),
        F.round(F.avg("entropy"), 6).alias("mean_entropy"),
    )
    return per_cluster.select("cluster_size", "mean_p_max", "mean_entropy").orderBy(
        F.desc("cluster_size"), "mean_p_max"
    )


# ---------------------------------------------------------------------------
# M20: adjusted Rand index of KMeans labels vs ground truth
# (reference research/pipeline.py seed-stability ARI; sklearn
# adjusted_rand_score re-derived from the contingency table)
# ---------------------------------------------------------------------------
@query(
    "m20_ari_vs_truth",
    eager=True,
    oracle=f"""
    WITH p AS (
        SELECT label, prediction FROM read_parquet('{_export_glob("m20_pred")}')
    ), cells AS (
        SELECT label, prediction, CAST(COUNT(*) AS BIGINT) AS c
        FROM p GROUP BY label, prediction
    ), stats AS (
        SELECT SUM(c * (c - 1) / 2.0) AS s,
               CAST(SUM(c) AS BIGINT) AS n
        FROM cells
    ), ra AS (
        SELECT SUM(rc * (rc - 1) / 2.0) AS a FROM (
            SELECT CAST(SUM(c) AS BIGINT) AS rc FROM cells GROUP BY label
        )
    ), cb AS (
        SELECT SUM(cc * (cc - 1) / 2.0) AS b FROM (
            SELECT CAST(SUM(c) AS BIGINT) AS cc FROM cells GROUP BY prediction
        )
    )
    SELECT CAST(n AS INT) AS n_rows,
           ROUND(CASE WHEN (a + b) / 2.0 - a * b / (n * (n - 1) / 2.0) = 0
                      THEN 0.0
                      ELSE (s - a * b / (n * (n - 1) / 2.0))
                           / ((a + b) / 2.0 - a * b / (n * (n - 1) / 2.0))
                 END, 6) AS ari
    FROM stats, ra, cb
    """,
)
def m20_ari_vs_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI from the label×cluster contingency table: the pair counts are
    distributed aggregates; the final scalar folds on the driver (the
    table is at most k×n_labels cells). Label assignments are persisted
    so the oracle re-derives the identical ARI in SQL."""
    pred = _export(
        _kmeans_predictions(spark, sf_dir).select(
            "vec_id", "label", F.col("prediction").cast("int").alias("prediction")
        ),
        spark,
        sf_dir,
        "m20_pred",
    )
    cells = pred.groupBy("label", "prediction").count().collect()
    n = sum(c["count"] for c in cells)
    from collections import defaultdict

    rows, cols = defaultdict(int), defaultdict(int)
    s = 0.0
    for c in cells:
        rows[c["label"]] += c["count"]
        cols[c["prediction"]] += c["count"]
        s += c["count"] * (c["count"] - 1) / 2.0
    a = sum(v * (v - 1) / 2.0 for v in rows.values())
    b = sum(v * (v - 1) / 2.0 for v in cols.values())
    tot = n * (n - 1) / 2.0
    expected = a * b / tot if tot else 0.0
    denom = (a + b) / 2.0 - expected
    ari = (s - expected) / denom if denom else 0.0
    return spark.createDataFrame(
        [(int(n), round(float(ari), 6))], schema="n_rows int, ari double"
    )


# ---------------------------------------------------------------------------
# M6: HDBSCAN — optional in the reference (research/clustering.py:184-203
# falls back when the package is missing). Since r8 the engine needs no
# package at all: operators/density.hdbscan_labels is a complete exact
# HDBSCAN (mutual-reachability MST -> condensed tree -> excess-of-mass
# selection, Campello/Moulavi/Sander 2013) in pure NumPy, deterministic
# by construction. The earlier DBSCAN fallback remains in the module for
# its single-eps semantics tests, but m6 no longer uses it — HDBSCAN's
# whole point is recovering clusters of DIFFERENT densities, which a
# single global eps structurally cannot (tests/test_operators.py::
# test_hdbscan_variable_density_beats_single_eps measures the contrast).
# ---------------------------------------------------------------------------


@query(
    "m6_density_clusters",
    eager=True,
    oracle=f"""
    WITH l AS (SELECT * FROM read_parquet('{_export_glob("m6_labels")}')),
    base AS (
        SELECT CAST(COUNT(*) AS INT) AS n_points,
               CAST(COUNT(DISTINCT CASE WHEN label <> -1 THEN label END) AS INT)
                   AS n_clusters,
               ROUND(AVG(CASE WHEN label = -1 THEN 1.0 ELSE 0.0 END), 6)
                   AS noise_share
        FROM l
    ), sz AS (
        SELECT label, COUNT(*) AS sz FROM l WHERE label <> -1 GROUP BY label
    ), rk AS (
        SELECT sz, ROW_NUMBER() OVER (ORDER BY sz DESC, label ASC) AS rn FROM sz
    ), top AS (
        SELECT CAST(COALESCE(MAX(CASE WHEN rn = 1 THEN sz END), 0) AS INT) AS size_1,
               CAST(COALESCE(MAX(CASE WHEN rn = 2 THEN sz END), 0) AS INT) AS size_2,
               CAST(COALESCE(MAX(CASE WHEN rn = 3 THEN sz END), 0) AS INT) AS size_3
        FROM rk
    ), tot AS (SELECT COUNT(*) AS t FROM embeddings)
    SELECT n_points,
           ROUND(n_points * 1.0 / t, 6) AS sample_coverage,
           n_clusters, noise_share, size_1, size_2, size_3
    FROM base, top, tot
    """,
)
def m6_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clustering diagnostics (M6): exact in-house HDBSCAN
    (operators/density.hdbscan_labels, min_cluster_size=5) — driver fit
    on an id-ordered capped sample (the reference's research fit is
    driver-side too). Output is label-invariant: cluster count, noise
    share, size profile of the top clusters. ``sample_coverage`` makes
    the capped-sample basis self-describing: at sf1+ the 4k cap covers
    a sliver of the corpus and the consumer must see that in the
    output, not the docstring."""
    import numpy as np

    from pipeline_mf_etl_spark.operators.density import hdbscan_labels

    emb = load_table(spark, sf_dir, "embeddings")
    n_total = emb.count()
    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(4000)
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    if len(X) < 2:  # no pairwise distances → no clusters, only noise
        labels = np.full(len(X), -1, dtype=np.int64)
    else:
        labels = hdbscan_labels(X, min_cluster_size=5)

    labels = np.asarray(labels)
    persisted = _export(
        spark.createDataFrame(
            [(int(r["vec_id"]), int(l)) for r, l in zip(rows, labels)],
            "vec_id long, label int",
        ),
        spark,
        sf_dir,
        "m6_labels",
    )
    # label-invariant rollup over the PERSISTED assignments, mirrored by
    # the DuckDB oracle over the same parquet
    from pyspark.sql import Window as W

    base = persisted.agg(
        F.count("*").cast("int").alias("n_points"),
        F.countDistinct(F.when(F.col("label") != -1, F.col("label")))
        .cast("int")
        .alias("n_clusters"),
        F.round(F.avg(F.when(F.col("label") == -1, 1.0).otherwise(0.0)), 6).alias(
            "noise_share"
        ),
    )
    sizes = (
        persisted.filter(F.col("label") != -1).groupBy("label").agg(F.count("*").alias("sz"))
    )
    rk = sizes.select(
        "sz",
        F.row_number().over(W.orderBy(F.desc("sz"), F.asc("label"))).alias("rn"),
    )
    top = rk.agg(
        *[
            F.coalesce(F.max(F.when(F.col("rn") == i, F.col("sz"))), F.lit(0))
            .cast("int")
            .alias(f"size_{i}")
            for i in (1, 2, 3)
        ]
    )
    return (
        base.crossJoin(top)
        .withColumn(
            "sample_coverage",
            F.round(F.col("n_points") * 1.0 / F.lit(n_total), 6)
            if n_total
            else F.lit(0.0),
        )
        .select(
            "n_points",
            "sample_coverage",
            "n_clusters",
            "noise_share",
            "size_1",
            "size_2",
            "size_3",
        )
    )


# ---------------------------------------------------------------------------
# M9-M11: Gaussian HMM — driver fit on capped sequence sample, broadcast
# distributed Viterbi/posterior decode (reference research_hmm/
# sequence_builder.py:25-108, hmm_model.py:29-98, decode.py:57-157).
# ---------------------------------------------------------------------------
# Memo of (applicationId, export tag) -> (producing sf_dir, path). The
# value holds the PATH, not the DataFrame: a cached frame pins the file
# listing it was created with, so any rewrite of the export (e.g.
# another harness process) would break collects with FILE_NOT_EXIST;
# re-reading on every hit stays robust while still skipping the
# expensive fit + decode + write. Keyed by the export module's _tag
# (basename + path hash — the SAME tag the on-disk path uses; a bare
# basename key once aliased to a directory that never existed and
# broke the v4 cache-hit read), so a hit always points at the
# directory export_frame actually wrote.
_HMM_EXPORT_CACHE: dict[tuple[str, str], str] = {}


def hmm_decoded_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the HMM, decode every series, persist the per-bar decoded
    frame (``m10_decoded``), return the read-back frame. Shared by the
    m10 per-state rollup and the v4 viewer state ribbon — both engines
    consume the identical persisted decode output. EAGER: fits and
    writes at call time (persisted-export pattern). Memoized per
    (session, sf_dir): certifying m10 AND v4 in one process pays the
    fit + decode + export once — the result is deterministic, so the
    second call would recompute identical rows; freshness is unaffected
    (the export was written by THIS process either way)."""
    from pipeline_mf_etl_spark.queries.export import _tag, read_export

    key = (spark.sparkContext.applicationId, _tag(sf_dir))
    if _HMM_EXPORT_CACHE.get(key) == sf_dir:
        return read_export(spark, sf_dir, "m10_decoded")
    import numpy as np
    from pyspark.sql import Window

    from pipeline_mf_etl_spark.functions.core import safe_div
    from pipeline_mf_etl_spark.operators.hmm import DiagGaussianHMM, decode_distributed

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ret = safe_div(F.col("value"), F.lag("value").over(w)) - 1
    bars = ev.select(
        "user_id", "ts", "event_id", "value", ret.alias("ret_1"), F.abs(ret).alias("abs_ret_1")
    )

    # FIT: capped driver sample — smallest user ids, deterministic; the
    # model is K×D-tiny so the sample bound is what matters at scale
    # (the reference caps its training matrices the same way).
    train_keys = [r[0] for r in
                  bars.select("user_id").distinct().orderBy("user_id").limit(60).collect()]
    train = (
        bars.filter(F.col("user_id").isin(train_keys))
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "ret_1", "abs_ret_1")
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in train:
        if r["ret_1"] is not None:
            seqs.setdefault(r["user_id"], []).append((r["ret_1"], r["abs_ret_1"]))
    sequences = [np.array(v) for v in seqs.values() if len(v) >= 20]
    model = DiagGaussianHMM(n_states=3, n_iter=30).fit(sequences)

    decoded = decode_distributed(bars, model.to_params(), ["ret_1", "abs_ret_1"], min_len=20)
    out = _export(
        decoded.join(bars.select("event_id", "ts", "value", "ret_1"), "event_id").select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.col("hmm_state").cast("int").alias("hmm_state"),
            "state_prob_max",
            "state_entropy",
            "ret_1",
        ),
        spark,
        sf_dir,
        "m10_decoded",
    )
    _HMM_EXPORT_CACHE[key] = sf_dir
    return out


@query(
    "m10_hmm_states",
    eager=True,
    oracle=f"""
    SELECT hmm_state,
           COUNT(*) AS n_bars,
           ROUND(AVG(state_prob_max), 6) AS mean_prob_max,
           ROUND(AVG(state_entropy), 6) AS mean_entropy,
           ROUND(AVG(ret_1), 6) AS mean_ret
    FROM read_parquet('{_export_glob("m10_decoded")}')
    GROUP BY hmm_state
    ORDER BY hmm_state
    """,
)
def m10_hmm_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state HMM diagnostics after distributed decode: bar counts,
    mean decoded confidence/entropy, mean return — deterministic
    (seedless quantile init, fixed iteration schedule). The decoded
    per-bar frame is persisted so the per-state rollup is
    oracle-checked over the exact decode output."""
    joined = hmm_decoded_export(spark, sf_dir)
    return (
        joined.groupBy("hmm_state")
        .agg(
            F.count("*").alias("n_bars"),
            F.round(F.avg("state_prob_max"), 6).alias("mean_prob_max"),
            F.round(F.avg("state_entropy"), 6).alias("mean_entropy"),
            F.round(F.avg("ret_1"), 6).alias("mean_ret"),
        )
        .orderBy("hmm_state")
    )


# ---------------------------------------------------------------------------
# M7b: EXACT pairwise silhouette on a capped sample — the reference-
# parity twin of m7 (research/clustering.py:31-71 subsamples sklearn
# silhouette to <=200k rows; m7's full-corpus simplified silhouette is
# the scale path, this is the fidelity path).
# ---------------------------------------------------------------------------
_M7B_CAP = 1000


def _m7b_oracle() -> str:
    return f"""
    WITH s AS (
        SELECT vec_id, prediction, CAST(v AS DOUBLE[]) AS v
        FROM read_parquet('{_export_glob("m7b_sample")}')
    ), pairs AS (
        SELECT p.vec_id AS i, p.prediction AS ci, q.prediction AS cj,
               SQRT(GREATEST(ROUND(
                   list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, q.v)
                   + list_dot_product(q.v, q.v), 9), 0)) AS dist
        FROM s p JOIN s q ON p.vec_id <> q.vec_id
    ), md AS (
        SELECT i, ci, cj, ROUND(AVG(dist), 6) AS mdist
        FROM pairs GROUP BY i, ci, cj
    ), pp AS (
        SELECT i, ci,
               MAX(CASE WHEN ci = cj THEN mdist END) AS a,
               MIN(CASE WHEN ci <> cj THEN mdist END) AS b
        FROM md GROUP BY i, ci
    ), sil AS (
        SELECT ci, CASE WHEN a IS NULL OR b IS NULL OR GREATEST(a, b) = 0
                        THEN 0.0 ELSE (b - a) / GREATEST(a, b) END AS s
        FROM pp
    )
    SELECT ci AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(AVG(s), 6) AS mean_silhouette
    FROM sil GROUP BY ci
    """


@query("m7b_silhouette_sampled", eager=True, oracle=_m7b_oracle())
def m7b_silhouette_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact silhouette per cluster on a deterministic hash-sample of
    AT MOST 1000 clustered embeddings — the cap is enforced by an
    ordered LIMIT (exactly the 1000 smallest md5-fold keys under the
    total order (key, vec_id) — TakeOrderedAndProject, never a global
    sort), not by a Bernoulli rate whose binomial draw would routinely
    overshoot the bound the O(S²) pairwise stage depends on. a(i) = mean distance to
    same-cluster sampled points, b(i) = min over other clusters of the
    mean distance, s = (b-a)/max(a,b) (singletons score 0, the sklearn
    convention). EAGER: fits KMeans, hash-samples, persists the sample
    (``m7b_sample``) so both engines run the identical pairwise set.

    Scale shape: the reference's exact silhouette is O(S²) by
    definition — the cap bounds S, the sampled side is broadcast, and
    distances use the rounded dot-product identity (same 9-dp guard as
    m7) so accumulation ulps cannot flip the nearest-other-cluster
    choice. The full-corpus scale path remains m7."""
    from pipeline_mf_etl_spark.operators.dedupe import md5_unit

    pred = _kmeans_predictions(spark, sf_dir).select(
        "vec_id", F.col("prediction").cast("int").alias("prediction")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    pts = pred.join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        "vec_id",
    )
    samp = _export(
        pts.withColumn("__u", md5_unit(F.col("vec_id"), "sil:"))
        .orderBy("__u", "vec_id")
        .limit(_M7B_CAP)
        .drop("__u"),
        spark,
        sf_dir,
        "m7b_sample",
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    p = samp.select(
        F.col("vec_id").alias("i"), F.col("prediction").alias("ci"), F.col("v").alias("vi")
    )
    q = samp.select(
        F.col("vec_id").alias("j"), F.col("prediction").alias("cj"), F.col("v").alias("vj")
    )
    d2 = F.round(
        _dot(F.col("vi"), F.col("vi"))
        - 2 * _dot(F.col("vi"), F.col("vj"))
        + _dot(F.col("vj"), F.col("vj")),
        9,
    )
    pairs = (
        p.crossJoin(F.broadcast(q))
        .filter(F.col("i") != F.col("j"))
        .select("i", "ci", "cj", F.sqrt(F.greatest(d2, F.lit(0.0))).alias("dist"))
    )
    md = pairs.groupBy("i", "ci", "cj").agg(F.round(F.avg("dist"), 6).alias("mdist"))
    pp = md.groupBy("i", "ci").agg(
        F.max(F.when(F.col("ci") == F.col("cj"), F.col("mdist"))).alias("a"),
        F.min(F.when(F.col("ci") != F.col("cj"), F.col("mdist"))).alias("b"),
    )
    s = F.when(
        F.col("a").isNull() | F.col("b").isNull()
        | (F.greatest("a", "b") == 0),
        F.lit(0.0),
    ).otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
    return pp.groupBy(F.col("ci").alias("cluster")).agg(
        F.count("*").alias("n_sampled"),
        F.round(F.avg(s), 6).alias("mean_silhouette"),
    )
