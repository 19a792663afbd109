"""A8: K-Means range compression — ≤3 [gte, lte] coverage ranges per
numeric/temporal column (the reference's coarse zone map for range
queries; lib_profiler/datamart_profiler/numerical.py:36-84).

Reference semantics reproduced exactly:
- k = min(3, n) clusters over the raw values;
- clusters holding < 10% of values dropped (outlier elimination,
  MIN_RANGE_SIZE, numerical.py:14,64-66);
- each kept cluster trimmed to its [int(0.05·n), int(0.95·n)] sorted
  index ([5%, 95%] confidence interval, numerical.py:68-74);
- ranges sorted ascending.

Deviation (documented): the reference runs sklearn KMeans(random_state
=0) — sklearn is not in this environment, so the clustering here is
deterministic Lloyd's k-means seeded at the k evenly-spaced quantiles
(no RNG at all).  Same objective, same output semantics; on 1-D data
Lloyd's from quantile seeds converges to the same partition sklearn
finds in practice (pinned by tests/test_profiler.py fixtures).
"""

from __future__ import annotations

import numpy as np

N_RANGES = 3
MIN_RANGE_SIZE = 0.1  # 10%, numerical.py:14
_MAX_ITER = 300


def _lloyd_1d(vals: np.ndarray, k: int) -> np.ndarray:
    """Deterministic 1-D Lloyd's k-means: returns per-value labels by
    ascending center.  Seeds = evenly spaced quantiles (no RNG)."""
    centers = np.quantile(vals, [(2 * i + 1) / (2 * k) for i in range(k)])
    centers = np.unique(centers)
    order = np.argsort(vals, kind="stable")
    sv = vals[order]
    for _ in range(_MAX_ITER):
        if centers.size == 1:
            break
        # 1-D nearest-center assignment = cut at midpoints between centers
        cuts = (centers[:-1] + centers[1:]) / 2.0
        idx = np.searchsorted(sv, cuts)  # boundaries in the sorted array
        bounds = np.concatenate([[0], idx, [sv.size]])
        new_centers = []
        for i in range(centers.size):
            seg = sv[bounds[i]:bounds[i + 1]]
            if seg.size:
                new_centers.append(seg.mean())
        new_centers = np.unique(np.asarray(new_centers))
        if new_centers.size == centers.size and np.allclose(new_centers, centers):
            break
        centers = new_centers
    # final labels in ORIGINAL value order
    if centers.size == 1:
        return np.zeros(vals.size, dtype=np.int64)
    cuts = (centers[:-1] + centers[1:]) / 2.0
    return np.searchsorted(cuts, vals, side="right")


def kmeans_ranges(values) -> list[tuple[float, float]]:
    """≤3 (gte, lte) coverage ranges — numerical.py:36-84 semantics."""
    vals = np.asarray(list(values) if not isinstance(values, np.ndarray) else values,
                      dtype=np.float64)
    vals = vals[~np.isnan(vals)]
    if vals.size == 0:
        return []
    k = min(N_RANGES, vals.size)
    labels = _lloyd_1d(vals, k)
    ranges = []
    for rg in range(int(labels.max()) + 1):
        cluster = np.sort(vals[labels == rg])
        if cluster.size == 0:
            continue
        if cluster.size < MIN_RANGE_SIZE * vals.size:  # outlier cluster
            continue
        min_idx = int(0.05 * cluster.size)
        max_idx = int(0.95 * cluster.size)
        ranges.append((float(cluster[min_idx]), float(cluster[max_idx])))
    ranges.sort()
    return ranges
