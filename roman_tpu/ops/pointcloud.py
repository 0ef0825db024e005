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
    """Keep-mask for statistical outlier removal, o3d-EXACT
    (RemoveStatisticalOutliers, called at reference segment.py:183-184):
    SearchKNN over the cloud returns the query point itself among the
    nb_neighbors hits (distance 0), so each point's statistic averages
    its nb_neighbors-1 real neighbors over a nb_neighbors denominator;
    the cloud-level std uses Bessel's N-1; and a point is kept iff
    0 < avg < mean + std_ratio * std (strict, and zero-avg duplicates
    are dropped like o3d drops them).

    points (..., n, 3), mask (..., n) -> keep (..., n) (subset of mask).
    """
    d2 = jnp.sum(
        (points[..., :, None, :] - points[..., None, :, :]) ** 2, axis=-1
    )
    pair_ok = mask[..., :, None] & mask[..., None, :]
    d2 = jnp.where(pair_ok, d2, _BIG)  # self kept: o3d's KNN includes it
    k = min(nb_neighbors, points.shape[-2])
    # negative top_k = k smallest
    knn_d2, _ = jax.lax.top_k(-d2, k)
    knn_d = jnp.sqrt(jnp.maximum(-knn_d2, 0.0))
    knn_valid = knn_d < jnp.sqrt(_BIG) * 0.5
    nvalid = jnp.maximum(jnp.sum(knn_valid, axis=-1), 1)
    mean_d = jnp.sum(jnp.where(knn_valid, knn_d, 0.0), axis=-1) / nvalid

    mf = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(mf, axis=-1), 1.0)
    mu = jnp.sum(mean_d * mf, axis=-1) / n
    var = jnp.sum((mean_d - mu[..., None]) ** 2 * mf,
                  axis=-1) / jnp.maximum(n - 1.0, 1.0)
    thresh = mu + std_ratio * jnp.sqrt(var)
    return mask & (mean_d > 0.0) & (mean_d < thresh[..., None])


def largest_cluster_mask(
    points: jax.Array, mask: jax.Array, eps: float = 0.25,
    min_points: int = 10, adaptive_spacing_factor: float | None = None
) -> jax.Array:
    """Device DBSCAN-equivalent largest-cluster keep-mask (reference
    final_cleanup, segment.py:195-220), static-shape and batched over
    leading dims — usable inside jit (e.g. the BatchMapper export
    program's retirement cleanup).

    Semantics match sklearn DBSCAN + keep-largest: core points have
    >= min_points neighbors within eps (self included), clusters are
    connected components of the core-core eps graph (transitive closure
    by log2(P) boolean matmul squarings), border points attach to the
    minimum-label core within eps, noise is dropped. If no cluster
    exists, all points are kept (matching largest_cluster_mask_np).

    adaptive_spacing_factor: when set, the per-row effective eps is
    max(eps, factor * median nearest-neighbor distance). The reference's
    fixed eps assumes points at segment-voxel spacing; a pool stored at
    an adaptively COARSENED resolution (voxel_downsample
    max_coarsen_levels) has spacing > eps, every point becomes noise,
    and the keep-all fallback would silently skip straggler removal —
    scaling eps to the actual spacing keeps the cleanup meaningful.

    points (..., P, 3), mask (..., P) -> keep (..., P) subset of mask.
    """
    P = points.shape[-2]
    d2 = jnp.sum(
        (points[..., :, None, :] - points[..., None, :, :]) ** 2, axis=-1
    )
    pair_ok = mask[..., :, None] & mask[..., None, :]
    eye = jnp.eye(P, dtype=bool)
    if adaptive_spacing_factor is not None:
        nn_d2 = jnp.min(jnp.where(pair_ok & ~eye, d2, _BIG), axis=-1)
        nn_d = jnp.sqrt(jnp.where(mask & (nn_d2 < _BIG * 0.5), nn_d2, 0.0))
        # masked median: sort with invalid as +inf, index (nvalid-1)//2
        srt = jnp.sort(jnp.where(mask & (nn_d > 0), nn_d, jnp.inf), axis=-1)
        nvalid = jnp.sum(mask & (nn_d > 0), axis=-1)
        mid = jnp.clip((nvalid - 1) // 2, 0, P - 1)
        med = jnp.take_along_axis(srt, mid[..., None], axis=-1)[..., 0]
        med = jnp.where(jnp.isfinite(med), med, 0.0)
        eps_eff = jnp.maximum(eps, adaptive_spacing_factor * med)
        eps2 = (eps_eff * eps_eff)[..., None, None]
    else:
        eps2 = eps * eps
    within = pair_ok & (d2 <= eps2)  # includes self (d2=0)
    n_nbr = jnp.sum(within, axis=-1)
    core = mask & (n_nbr >= min_points)

    # connected components over the core-core graph: transitive closure
    # via repeated squaring of the (float) adjacency on the MXU
    adj = (within & core[..., :, None] & core[..., None, :]).astype(
        jnp.float32)
    n_sq = max(int(np.ceil(np.log2(max(P, 2)))), 1)
    for _ in range(n_sq):
        adj = jnp.minimum(
            adj + jnp.einsum("...ik,...kj->...ij", adj, adj), 1.0)
    reach = adj > 0.5

    idx = jnp.arange(P)
    big = jnp.asarray(P, jnp.int32)
    # core label = min reachable core index; border label = min label of
    # any core within eps; noise = big sentinel
    core_label = jnp.min(jnp.where(reach, idx[None, :], big), axis=-1)
    core_label = jnp.where(core, core_label, big)
    border_label = jnp.min(
        jnp.where(within & core[..., None, :], core_label[..., None, :], big),
        axis=-1,
    )
    label = jnp.where(core, core_label, jnp.where(mask, border_label, big))

    # cluster sizes via one-hot reduction; keep the largest
    member = (label[..., :, None] == idx[None, :]) & (label < P)[..., :, None]
    counts = jnp.sum(member, axis=-2)  # (..., P) size of cluster rooted at idx
    best = jnp.argmax(counts, axis=-1)
    any_cluster = jnp.max(counts, axis=-1) > 0
    keep = label == best[..., None]
    return mask & jnp.where(any_cluster[..., None], keep, True)


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
    # o3d-exact: SearchKNN includes the query itself (distance 0) among
    # the nb_neighbors hits, the cloud std uses N-1, and the keep rule
    # is strict 0 < avg < thresh (see statistical_outlier_mask)
    np.fill_diagonal(d2, 0.0)
    k = min(nb_neighbors, n)
    part = np.partition(d2, k - 1, axis=1)[:, :k]
    mean_d = np.sqrt(np.maximum(part, 0.0)).mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std(ddof=1)
    return (mean_d > 0.0) & (mean_d < thresh)
