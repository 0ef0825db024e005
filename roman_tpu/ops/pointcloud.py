"""Point-cloud maintenance ops: statistical outlier removal, grid-DBSCAN
largest-cluster extraction, masked transforms.

TPU-native equivalents of the open3d calls in the reference's Segment
(_cleanup_points: voxel downsample + remove_statistical_outlier,
segment.py:177-193; final_cleanup: DBSCAN largest cluster,
segment.py:195-220). All device ops are static-shape over padded point
buffers; numpy twins are provided for the host-side mapper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9


def statistical_outlier_mask(
    points: jax.Array, mask: jax.Array, nb_neighbors: int = 10, std_ratio: float = 1.0
) -> jax.Array:
    """Keep-mask for statistical outlier removal (o3d semantics,
    segment.py:183-184): a point is kept if its mean distance to its
    nb_neighbors nearest neighbors is below mean + std_ratio * std of that
    statistic over the cloud.

    points (..., n, 3), mask (..., n) -> keep (..., n) (subset of mask).
    """
    d2 = jnp.sum(
        (points[..., :, None, :] - points[..., None, :, :]) ** 2, axis=-1
    )
    pair_ok = mask[..., :, None] & mask[..., None, :]
    eye = jnp.eye(points.shape[-2], dtype=bool)
    d2 = jnp.where(pair_ok & ~eye, d2, _BIG)
    k = min(nb_neighbors, points.shape[-2] - 1)
    # negative top_k = k smallest
    knn_d2, _ = jax.lax.top_k(-d2, k)
    knn_d = jnp.sqrt(jnp.maximum(-knn_d2, 0.0))
    knn_valid = knn_d < jnp.sqrt(_BIG) * 0.5
    nvalid = jnp.maximum(jnp.sum(knn_valid, axis=-1), 1)
    mean_d = jnp.sum(jnp.where(knn_valid, knn_d, 0.0), axis=-1) / nvalid

    mf = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(mf, axis=-1), 1.0)
    mu = jnp.sum(mean_d * mf, axis=-1) / n
    var = jnp.sum((mean_d - mu[..., None]) ** 2 * mf, axis=-1) / n
    thresh = mu + std_ratio * jnp.sqrt(var)
    return mask & (mean_d <= thresh[..., None])


def largest_cluster_mask_np(
    points: np.ndarray, eps: float = 0.25, min_points: int = 10
) -> np.ndarray:
    """DBSCAN largest-cluster keep-mask (reference final_cleanup,
    segment.py:195-220). Host-side (sklearn); called once per segment at
    retirement, not in a hot loop.

    Matches the reference's behavior of keeping the largest cluster; note
    the reference's np.argmax over an empty array throws when everything is
    noise — here all points are kept in that degenerate case.
    """
    from sklearn.cluster import DBSCAN

    pts = np.asarray(points)
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    labels = DBSCAN(eps=eps, min_samples=min_points).fit(pts).labels_
    valid = labels >= 0
    if not np.any(valid):
        return np.ones(len(pts), dtype=bool)
    largest = np.argmax(np.bincount(labels[valid]))
    return labels == largest


def statistical_outlier_mask_np(
    points: np.ndarray, nb_neighbors: int = 10, std_ratio: float = 1.0
) -> np.ndarray:
    """Numpy twin of statistical_outlier_mask (o3d remove_statistical_outlier).

    Runs on every segment point-insert (the reference calls o3d's C++
    KD-tree version there, segment.py:183), so it is written for speed:
    squared distances via the Gram trick (one BLAS matmul) and k-NN via
    np.partition instead of a full sort.
    """
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n <= 1:
        return np.ones(n, dtype=bool)
    sq = np.einsum("ij,ij->i", pts, pts)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (pts @ pts.T)
    np.fill_diagonal(d2, np.inf)
    k = min(nb_neighbors, n - 1)
    part = np.partition(d2, k - 1, axis=1)[:, :k]
    mean_d = np.sqrt(np.maximum(part, 0.0)).mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std()
    return mean_d <= thresh
