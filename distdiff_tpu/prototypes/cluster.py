"""Average-linkage agglomerative clustering, from scratch in numpy.

The reference delegates to ``sklearn.cluster.AgglomerativeClustering(
n_clusters=K, linkage='average')`` (``dataloader.py:699-705``). Class sizes
in these datasets are tiny (tens to a few hundred samples), so the O(n^3)
host-side Lance-Williams update is more than fast enough and keeps the
framework self-contained; tests cross-check labels against sklearn.
"""

from __future__ import annotations

import numpy as np


def agglomerative_average(x: np.ndarray, n_clusters: int) -> np.ndarray:
    """Cluster rows of ``x`` [N, D] into ``n_clusters`` groups.

    Returns integer labels [N] (arbitrary label ids, contiguous from 0).
    Euclidean affinity, average linkage (UPGMA), matching sklearn defaults
    for the reference's configuration.
    """
    n = x.shape[0]
    if n_clusters >= n:
        return np.arange(n)

    # pairwise euclidean distances
    sq = np.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    dist = np.sqrt(np.maximum(d2, 0.0))
    np.fill_diagonal(dist, np.inf)

    active = list(range(n))
    sizes = {i: 1 for i in range(n)}
    members = {i: [i] for i in range(n)}
    d = dist.copy()

    while len(active) > n_clusters:
        # find the closest active pair
        sub = d[np.ix_(active, active)]
        flat = np.argmin(sub)
        ai, aj = np.unravel_index(flat, sub.shape)
        i, j = active[ai], active[aj]
        if i > j:
            i, j = j, i
        # Lance-Williams average-linkage update: d(i∪j, k) =
        # (|i| d(i,k) + |j| d(j,k)) / (|i|+|j|)
        ni, nj = sizes[i], sizes[j]
        for k in active:
            if k in (i, j):
                continue
            d[i, k] = d[k, i] = (ni * d[i, k] + nj * d[j, k]) / (ni + nj)
        sizes[i] = ni + nj
        members[i].extend(members[j])
        active.remove(j)
        d[j, :] = np.inf
        d[:, j] = np.inf

    labels = np.empty(n, np.int64)
    for li, root in enumerate(active):
        for m in members[root]:
            labels[m] = li
    return labels
