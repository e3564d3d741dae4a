"""Density-based clustering (M6) — pure-NumPy DBSCAN fallback.

The reference treats HDBSCAN as an optional dependency
(research/clustering.py:184-203); this container has neither sklearn
nor hdbscan, so the engine gates the exact HDBSCAN path
(queries/ml.py:hdbscan_fit) and provides this deterministic fallback
with the same operational contract: integer cluster labels with ``-1``
noise, fit on a bounded driver sample, cluster-level diagnostics only
(label-invariant outputs, like every ML query here).

Scale shape mirrors the HMM/IVF pattern: the O(n²) fit runs on a capped
id-ordered sample on the driver; anything distributed consumes only the
tiny per-cluster summary (broadcastable), never the pairwise matrix.
"""

from __future__ import annotations

import numpy as np


def pairwise_dist_chunked(X: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Full pairwise Euclidean distances, computed in row chunks so the
    peak temporary is chunk×n instead of n×n×3."""
    n = len(X)
    sq = (X**2).sum(axis=1)
    D = np.empty((n, n), dtype=np.float64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d2 = sq[lo:hi, None] + sq[None, :] - 2.0 * (X[lo:hi] @ X.T)
        np.maximum(d2, 0.0, out=d2)
        D[lo:hi] = np.sqrt(d2)
    return D


def dbscan_labels(
    X: np.ndarray, eps: float, min_pts: int, D: np.ndarray | None = None
) -> np.ndarray:
    """Deterministic DBSCAN: BFS over the core-point graph in index
    order. Labels are assigned in first-touch order, noise = -1.

    Classic DBSCAN semantics (Ester et al. 1996): a point is CORE if it
    has >= min_pts neighbors within eps (self included); clusters are
    the connected components of core points under the eps-neighborhood
    relation, plus their border points; everything else is noise.

    Pass a precomputed distance matrix ``D`` to share it with the eps
    derivation (it is the O(n²) cost of the whole fit).
    """
    n = len(X)
    if D is None:
        D = pairwise_dist_chunked(X)
    neigh = D <= eps
    core = neigh.sum(axis=1) >= min_pts
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if not core[i] or labels[i] != -1:
            continue
        frontier = [i]
        labels[i] = cluster
        while frontier:
            j = frontier.pop()
            if not core[j]:
                continue  # border point: joins, doesn't expand
            for k in np.flatnonzero(neigh[j]):
                if labels[k] == -1:
                    labels[k] = cluster
                    frontier.append(int(k))
        cluster += 1
    return labels


def eps_from_quantile(
    X: np.ndarray, q: float = 0.02, D: np.ndarray | None = None
) -> float:
    """Data-adaptive eps: the q-quantile of the (sampled) pairwise
    distance distribution — deterministic, no hand-tuned constant."""
    if D is None:
        D = pairwise_dist_chunked(X)
    upper = D[np.triu_indices(len(X), k=1)]
    return float(np.quantile(upper, q))
