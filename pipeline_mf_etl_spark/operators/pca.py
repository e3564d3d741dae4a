"""Distributed PCA over embedding columns.

The scale shape is the classical one-pass Gram decomposition: each
partition reduces its rows to a single (n, Σx, XᵀX) partial in one
Arrow-batched NumPy pass (mapInPandas, no shuffle), the driver combines
the tiny d×d partials (d = embedding dim, 64 here — a few KB each; one
row per partition crosses the wire, never a data row) and
eigendecomposes the covariance. Projection is then map-only: the q×d
component matrix is broadcast and each vector's q projections are
computed with JVM array HOFs — at 100 TB the fit reads the corpus once
and the transform is embarrassingly parallel.

Centering is folded into the projection as a per-component bias:
proj_j = ⟨x, w_j⟩ − ⟨μ, w_j⟩, so the hot path never materializes
centered copies of the input.

Eigenvector sign is fixed by making each component's
largest-magnitude coordinate positive (eigh is sign-ambiguous).

No reference counterpart (the reference's ML surface is
clustering/HMM); engine addition per SURVEY.md §2.13 — the embedding
dimensionality-reduction step an ANN/semantic-dedup pipeline runs
before indexing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_mf_etl_spark.operators.similarity import dot


def _partial_grams(vectors: DataFrame, vec_col: str) -> DataFrame:
    """One (partition_id, n, Σx, flattened XᵀX) row per non-empty
    partition. partition_id makes the driver-side combine order
    deterministic (float sums are order-sensitive)."""

    def gen(batches):
        from pyspark import TaskContext

        n = 0
        s = None
        g = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [list(s)], "g": [list(g.ravel())]}
            )

    return vectors.select(vec_col).mapInPandas(
        gen, "pid int, n long, s array<double>, g array<double>"
    )


def fit_pca(vectors: DataFrame, q: int = 8, vec_col: str = "v"):
    """Fit PCA on a vector column; returns (W, bias, eigvals) with
    W: (q, d) row-major components (descending eigenvalue), bias_j =
    ⟨μ, w_j⟩, eigvals the top-q covariance eigenvalues.

    Driver work is O(partitions · d² + d³) — independent of row count.
    """
    rows = sorted(_partial_grams(vectors, vec_col).collect(), key=lambda r: r["pid"])
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    if n < 2:
        raise ValueError("fit_pca: need >= 2 rows")
    s = np.zeros(d)
    gram = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        gram += np.asarray(r["g"]).reshape(d, d)
    mu = s / n
    cov = (gram - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:q]
    w = vecs[:, order].T.copy()
    for j in range(w.shape[0]):  # sign convention
        if w[j, np.argmax(np.abs(w[j]))] < 0:
            w[j] = -w[j]
    return w, w @ mu, vals[order]


def components_frame(spark: SparkSession, w: np.ndarray, bias: np.ndarray, eigvals: np.ndarray) -> DataFrame:
    """(pc_idx, weights, bias, eigval) — the broadcastable model."""
    return spark.createDataFrame(
        [
            (int(j), [float(x) for x in w[j]], float(bias[j]), float(eigvals[j]))
            for j in range(w.shape[0])
        ],
        "pc_idx int, weights array<double>, bias double, eigval double",
    )


def pca_project(
    vectors: DataFrame,
    components: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Map-only projection: broadcast the q-row component frame and emit
    (id, pc_idx, proj) per vector×component. The dot is a JVM array
    fold (same left-to-right order as the oracle's list_dot_product),
    rounded at 6 dp."""
    return vectors.crossJoin(F.broadcast(components)).select(
        F.col(id_col),
        "pc_idx",
        F.round(dot(F.col(vec_col), F.col("weights")) - F.col("bias"), 6).alias("proj"),
    )
