"""Density-based clustering (M6) — pure-NumPy exact HDBSCAN + DBSCAN.

The reference treats HDBSCAN as an optional dependency
(research/clustering.py:184-203); this engine carries NO such gate:
``hdbscan_labels`` below is a complete exact HDBSCAN (mutual-
reachability MST -> single-linkage dendrogram -> condensed tree ->
excess-of-mass selection) with the standard operational contract —
integer cluster labels with ``-1`` noise, fit on a bounded driver
sample, cluster-level diagnostics only (label-invariant outputs, like
every ML query here). ``dbscan_labels`` (single global eps) stays for
its own semantics and as the measured contrast case.

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


# ---------------------------------------------------------------------------
# Exact HDBSCAN (Campello, Moulavi, Sander 2013) — pure NumPy, no
# optional package. Pipeline: core distances (min_samples-th NN, self
# included, matching the reference library's convention) → mutual-
# reachability graph → Prim MST (O(n²), fine at the 4k driver cap) →
# single-linkage dendrogram → condensed tree at min_cluster_size →
# excess-of-mass cluster selection (allow_single_cluster=False: the
# root is never selected, exactly like the library default). All ties
# break on index order, so labels are deterministic.
# ---------------------------------------------------------------------------
def _mst_prim(W: np.ndarray) -> list[tuple[float, int, int]]:
    """Minimum spanning tree of a dense weight matrix, Prim's algorithm.
    Returns (weight, a, b) edges; ties resolve toward the lowest index
    (np.argmin picks the first minimum), so the tree is deterministic."""
    n = len(W)
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    best_from = np.zeros(n, dtype=np.int64)
    in_tree[0] = True
    np.minimum(best, W[0], out=best)
    best_from[:] = 0
    best[0] = np.inf
    edges: list[tuple[float, int, int]] = []
    for _ in range(n - 1):
        j = int(np.argmin(best))
        edges.append((float(best[j]), int(best_from[j]), j))
        in_tree[j] = True
        improved = W[j] < best
        improved &= ~in_tree
        best_from[improved] = j
        np.minimum(best, np.where(in_tree, np.inf, W[j]), out=best)
        best[j] = np.inf
    return edges


def hdbscan_labels(
    X: np.ndarray,
    min_cluster_size: int = 5,
    min_samples: int | None = None,
    D: np.ndarray | None = None,
) -> np.ndarray:
    """Exact HDBSCAN labels with -1 noise.

    Unlike DBSCAN's single global eps, the condensed tree keeps a
    cluster alive across its own density range and the excess-of-mass
    rule picks the most stable clusters — so clusters of DIFFERENT
    densities are recovered simultaneously (the planted variable-
    density test asserts exactly the case a single-eps DBSCAN cannot
    split correctly).
    """
    if min_cluster_size < 2:
        raise ValueError("min_cluster_size must be >= 2")
    n = len(X)
    if min_samples is None:
        min_samples = min_cluster_size
    if n < min_cluster_size:
        return np.full(n, -1, dtype=np.int64)
    if D is None:
        D = pairwise_dist_chunked(X)

    # core distance: min_samples-th nearest including self (row has d=0
    # to itself, so index min_samples-1 after a partial sort)
    k = min(min_samples, n) - 1
    core = np.partition(D, k, axis=1)[:, k]
    mreach = np.maximum(np.maximum.outer(core, core), D)

    edges = sorted(
        _mst_prim(mreach), key=lambda e: (e[0], min(e[1], e[2]), max(e[1], e[2]))
    )

    # single-linkage dendrogram over the MST: leaves 0..n-1, internal
    # nodes n..2n-2 in merge order
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    comp_node = list(range(n))  # uf root -> dendrogram node id
    children: dict[int, tuple[int, int]] = {}
    node_dist = [0.0] * (2 * n - 1)
    size = [1] * n + [0] * (n - 1)
    nxt = n
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        na, nb = comp_node[ra], comp_node[rb]
        parent[ra] = rb
        children[nxt] = (na, nb)
        node_dist[nxt] = w
        size[nxt] = size[na] + size[nb]
        comp_node[rb] = nxt
        nxt += 1
    root = nxt - 1

    def leaves_under(node: int) -> list[int]:
        out, stack = [], [node]
        while stack:
            m = stack.pop()
            if m < n:
                out.append(m)
            else:
                stack.extend(children[m])
        return out

    def lam(dist: float) -> float:
        return 1.0 / max(dist, 1e-300)

    # condensed tree: clusters are born at splits where BOTH sides hold
    # >= min_cluster_size points; smaller sides fall out as members
    birth: dict[int, float] = {0: 0.0}
    stab: dict[int, float] = {0: 0.0}
    kids: dict[int, list[int]] = {0: []}
    members: dict[int, list[tuple[int, float]]] = {0: []}
    next_cid = 1
    stack = [(root, 0)]
    while stack:
        node, c = stack.pop()
        # only internal nodes ever reach the stack: pushed children have
        # size >= min_cluster_size >= 2 and the root is internal for
        # n >= 2 (guaranteed by the n < min_cluster_size early return)
        assert node >= n, "leaf reached the condensed-tree walk"
        d = node_dist[node]
        la = lam(d)
        L, R = children[node]
        big = [ch for ch in (L, R) if size[ch] >= min_cluster_size]
        if len(big) == 2:
            stab[c] += size[node] * (la - birth[c])
            for ch in (L, R):
                cid = next_cid
                next_cid += 1
                birth[cid] = la
                stab[cid] = 0.0
                kids[cid] = []
                members[cid] = []
                kids[c].append(cid)
                stack.append((ch, cid))
        elif len(big) == 1:
            small = R if big[0] == L else L
            for p in leaves_under(small):
                stab[c] += la - birth[c]
                members[c].append((p, la))
            stack.append((big[0], c))
        else:
            stab[c] += size[node] * (la - birth[c])
            for p in leaves_under(node):
                members[c].append((p, la))

    # excess-of-mass selection, bottom-up (children have larger cids);
    # the root cluster 0 is never selectable
    selected: dict[int, bool] = {}
    subtree_stab: dict[int, float] = {}
    for c in sorted(birth, reverse=True):
        ch_sum = sum(subtree_stab[ch] for ch in kids[c])
        if c == 0:
            selected[c] = False
            subtree_stab[c] = ch_sum
        elif not kids[c] or stab[c] >= ch_sum:
            selected[c] = True
            subtree_stab[c] = stab[c]
        else:
            selected[c] = False
            subtree_stab[c] = ch_sum

    def deselect_descendants(c: int) -> None:
        stack2 = list(kids[c])
        while stack2:
            d2 = stack2.pop()
            selected[d2] = False
            stack2.extend(kids[d2])

    for c in sorted(birth):  # top-down: outermost selected wins
        if selected.get(c):
            deselect_descendants(c)

    labels = np.full(n, -1, dtype=np.int64)
    picked = [c for c in sorted(birth) if selected.get(c)]
    for label, c in enumerate(picked):
        stack3 = [c]
        while stack3:
            d3 = stack3.pop()
            for p, _ in members[d3]:
                labels[p] = label
            stack3.extend(kids[d3])
    return labels
