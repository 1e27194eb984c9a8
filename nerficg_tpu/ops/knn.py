"""k-nearest-neighbor distances for Gaussian scale initialization.

Reference equivalent: the external simple-knn CUDA package
(src/Thirdparty/SimpleKNN.py, SURVEY §2.12 N14) used once at init for the
RMS distance of k=3 neighbors (src/Methods/GaussianSplatting/Model.py:94-119).
One-time host-side cost: sklearn's tree-based kNN (with a chunked numpy
fallback) is plenty.
"""

from __future__ import annotations

import numpy as np

__all__ = ['knn_mean_sq_distance']


def knn_mean_sq_distance(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors (excluding self)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if n <= k:
        d = np.linalg.norm(points[:, None] - points[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        d = np.sort(d, axis=-1)[:, :max(n - 1, 1)]
        return (d ** 2).mean(-1)
    try:
        from sklearn.neighbors import NearestNeighbors
        nn = NearestNeighbors(n_neighbors=k + 1).fit(points)
        dist, _ = nn.kneighbors(points)
        return (dist[:, 1:] ** 2).mean(-1).astype(np.float32)
    except ImportError:
        # Chunked brute force.
        out = np.empty(n, np.float32)
        chunk = max(1, (1 << 24) // max(n, 1))
        for i in range(0, n, chunk):
            d2 = ((points[i:i + chunk, None] - points[None, :]) ** 2).sum(-1)
            part = np.partition(d2, k + 1, axis=-1)[:, 1:k + 1]
            out[i:i + chunk] = part.mean(-1)
        return out
