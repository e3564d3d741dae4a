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
@query("m4_kmeans_profile")
def m4_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-ordered KMeans cluster profile (sizes + majority true label
    share) — invariant to cluster-id permutation."""
    pred = _kmeans_predictions(spark, sf_dir)
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
@query("m7_cluster_quality")
def m7_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette (squared Euclidean) + within-cluster SSE for the M4 fit."""
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.clustering import KMeans

    vec = _vectors(spark, sf_dir)
    model = KMeans(k=_K, seed=_SEED, maxIter=40, tol=1e-6).fit(vec)
    pred = model.transform(vec)
    sil = ClusteringEvaluator(
        featuresCol="features", predictionCol="prediction", metricName="silhouette"
    ).evaluate(pred)
    sse = model.summary.trainingCost
    return spark.createDataFrame(
        [(int(_K), round(float(sil), 6), round(float(sse), 3))],
        schema="k int, silhouette double, within_sse double",
    )


# ---------------------------------------------------------------------------
# M5: Gaussian mixture — weights + mean assignment entropy
# (reference research/clustering.py:147-182)
# ---------------------------------------------------------------------------
@query("m5_gmm_mixture")
def m5_gmm_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GMM mixture weights (sorted) with per-cluster mean max-probability
    and mean assignment entropy −Σ p·log p, computed from the probability
    vector with JVM-side vector ops."""
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
    per_cluster = probs.select(
        "prediction",
        F.array_max("p").alias("p_max"),
        ent.alias("entropy"),
    ).groupBy("prediction").agg(
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
@query("m20_ari_vs_truth")
def m20_ari_vs_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI from the label×cluster contingency table: the pair counts are
    distributed aggregates; the final scalar folds on the driver (the
    table is at most k×n_labels cells)."""
    pred = _kmeans_predictions(spark, sf_dir)
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
# M6: HDBSCAN — optional in the reference, unavailable here (no sklearn/
# hdbscan in the environment); the gate mirrors research/clustering.py:184-203.
# m6_density_clusters below runs the exact HDBSCAN when the package is
# present and otherwise a deterministic pure-NumPy DBSCAN with the same
# labels-with-noise contract (operators/density.py).
# ---------------------------------------------------------------------------
def hdbscan_fit(*_args, **_kwargs):
    try:
        import hdbscan  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "HDBSCAN requires the optional 'hdbscan' package (reference "
            "research/clustering.py:184-203 treats it as optional too)"
        ) from exc


@query("m6_density_clusters")
def m6_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clustering diagnostics (M6): HDBSCAN when installed, else
    the NumPy DBSCAN fallback — driver fit on an id-ordered capped
    sample (the reference's research fit is driver-side too), eps from
    the 2% pairwise-distance quantile, min_pts=5. Output is
    label-invariant: cluster count, noise share, size profile of the
    top clusters."""
    import numpy as np

    from pipeline_mf_etl_spark.operators.density import (
        dbscan_labels,
        eps_from_quantile,
    )

    emb = load_table(spark, sf_dir, "embeddings")
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
        try:
            import hdbscan

            labels = hdbscan.HDBSCAN(min_cluster_size=5).fit_predict(X)
        except ImportError:
            from pipeline_mf_etl_spark.operators.density import pairwise_dist_chunked

            D = pairwise_dist_chunked(X)  # shared: eps derivation + fit
            labels = dbscan_labels(X, eps_from_quantile(X, D=D), min_pts=5, D=D)

    labels = np.asarray(labels)
    n = len(labels)
    noise = int((labels == -1).sum())
    sizes = sorted(
        (int((labels == c).sum()) for c in set(labels) if c != -1), reverse=True
    )
    top = (sizes + [0, 0, 0])[:3]
    return spark.createDataFrame(
        [
            (
                int(n),
                int(len(sizes)),
                round(noise / n, 6) if n else 0.0,
                top[0],
                top[1],
                top[2],
            )
        ],
        schema=(
            "n_points int, n_clusters int, noise_share double, "
            "size_1 int, size_2 int, size_3 int"
        ),
    )


# ---------------------------------------------------------------------------
# M9-M11: Gaussian HMM — driver fit on capped sequence sample, broadcast
# distributed Viterbi/posterior decode (reference research_hmm/
# sequence_builder.py:25-108, hmm_model.py:29-98, decode.py:57-157).
# ---------------------------------------------------------------------------
@query("m10_hmm_states")
def m10_hmm_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state HMM diagnostics after distributed decode: bar counts,
    mean decoded confidence/entropy, mean return — deterministic
    (seedless quantile init, fixed iteration schedule)."""
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
    joined = decoded.join(bars.select("event_id", "ret_1"), "event_id")
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
