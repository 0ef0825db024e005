"""Masked, batched point-cloud geometry: covariance shape attributes
(Weinmann et al.), PCA oriented bounding boxes, AABBs.

TPU-native equivalent of the open3d-backed memoized attributes on the
reference's Segment (roman/object/segment.py:244-285, :433-472). The
reference computes these one segment at a time with open3d; here a whole
pool of segments (padded to a fixed point capacity) is processed in one
batched einsum + eigendecomposition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def masked_mean(points: jax.Array, mask: jax.Array) -> jax.Array:
    """(..., n, 3), (..., n) -> (..., 3)."""
    w = mask.astype(points.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    return jnp.sum(points * w, axis=-2) / n


def masked_covariance(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Sample covariance over valid points (matches o3d
    compute_mean_and_covariance semantics, segment.py:428-431)."""
    w = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mu = masked_mean(points, mask)
    c = (points - mu[..., None, :]) * w[..., None]
    return jnp.einsum(
        "...ni,...nj->...ij", c, c, precision=jax.lax.Precision.HIGHEST
    ) / n[..., None, None]


def normalized_eigenvalues(cov: jax.Array) -> jax.Array:
    """Descending eigenvalues of (...,3,3) covariances, normalized to sum 1.
    Reference segment.py:433-443 (uses SVD of the covariance)."""
    # covariance is symmetric PSD: eigh gives ascending order
    evals = jnp.linalg.eigvalsh(cov)
    evals = jnp.clip(evals[..., ::-1], 0.0, None)  # descending
    return evals / jnp.maximum(jnp.sum(evals, axis=-1, keepdims=True), _EPS)


def shape_attributes(points: jax.Array, mask: jax.Array) -> jax.Array:
    """(..., n, 3), (..., n) -> (..., 3) [linearity, planarity, scattering].

    Weinmann et al. ISPRS 2014 formulas, matching reference
    segment.py:446-472: lin=(e1-e2)/e1, plan=(e2-e3)/e1, scat=e3/e1.
    """
    e = normalized_eigenvalues(masked_covariance(points, mask))
    e1 = jnp.maximum(e[..., 0], _EPS)
    return jnp.stack(
        [
            (e[..., 0] - e[..., 1]) / e1,
            (e[..., 1] - e[..., 2]) / e1,
            e[..., 2] / e1,
        ],
        axis=-1,
    )


def shape_attributes_from_eigenvalues(e: jax.Array) -> jax.Array:
    e1 = jnp.maximum(e[..., 0], _EPS)
    return jnp.stack(
        [
            (e[..., 0] - e[..., 1]) / e1,
            (e[..., 1] - e[..., 2]) / e1,
            e[..., 2] / e1,
        ],
        axis=-1,
    )


def pca_obb(points: jax.Array, mask: jax.Array):
    """PCA-based oriented bounding box.

    The reference uses o3d OrientedBoundingBox.create_from_points
    (segment.py:246-263), which is PCA-based on the convex hull. A direct
    PCA over the (already voxel-downsampled) points is the standard
    batched-friendly equivalent; extents/volumes agree closely for the
    blob-like segments this pipeline produces.

    Returns:
      center (...,3), axes (...,3,3) rows=principal dirs, extent (...,3).
    """
    cov = masked_covariance(points, mask)
    _, vecs = jnp.linalg.eigh(cov)  # ascending; columns are eigenvectors
    axes = jnp.swapaxes(vecs[..., ::-1], -1, -2)  # rows, descending eigval
    mu = masked_mean(points, mask)
    proj = jnp.einsum("...ij,...nj->...ni", axes, points - mu[..., None, :])
    big = 1e9
    maskf = mask[..., None]
    lo = jnp.min(jnp.where(maskf, proj, big), axis=-2)
    hi = jnp.max(jnp.where(maskf, proj, -big), axis=-2)
    nvalid = jnp.sum(mask, axis=-1)
    extent = jnp.where((nvalid > 0)[..., None], hi - lo, 0.0)
    center = mu + jnp.einsum("...ji,...j->...i", axes, (hi + lo) * 0.5)
    return center, axes, extent


def obb_volume_extent(points: jax.Array, mask: jax.Array, min_points: int = 5):
    """Volume & extent with the reference's small-cloud guard: volume=0 and
    extent=0 unless more than 4 points (segment.py:252-263)."""
    _, _, extent = pca_obb(points, mask)
    nvalid = jnp.sum(mask, axis=-1)
    ok = nvalid >= min_points
    extent = jnp.where(ok[..., None], extent, 0.0)
    volume = jnp.prod(extent, axis=-1)
    return volume, extent


def aabb(points: jax.Array, mask: jax.Array):
    big = 1e9
    maskf = mask[..., None]
    lo = jnp.min(jnp.where(maskf, points, big), axis=-2)
    hi = jnp.max(jnp.where(maskf, points, -big), axis=-2)
    return lo, hi


def aabb_intersects(lo1, hi1, lo2, hi2) -> jax.Array:
    """Batched AABB overlap test (reference roman/utils.py:160-169)."""
    return jnp.all((lo1 <= hi2) & (hi1 >= lo2), axis=-1)


def convex_hull_2d(points):
    """2D convex hull (Andrew monotone chain), host-side numpy.

    Replaces the reference's shapely convex_hull (segment.py:406-418) used
    for drawing segment outlines. Returns (k,2) hull vertices CCW.
    """
    import numpy as np

    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points_iter):
        out = []
        for p in points_iter:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])
