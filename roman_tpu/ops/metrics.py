"""Similarity metrics between object point clouds / Gaussians, batched.

TPU-native equivalent of roman/object/similiarity_metrics.py:
- min-directional Chamfer distance (ChamferDistance.chamfer_distance):
  min over directions of the mean nearest-neighbor distance; the min (not
  the sum) is used to measure overlap and de-value extent.
- AABB-diagonal normalized Chamfer similarity (norm_chamfer_distance).
- 2-Wasserstein metric between Gaussians (Wasserstein.wasserstein_metric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e9


def chamfer_distance(
    points1: jax.Array, mask1: jax.Array, points2: jax.Array, mask2: jax.Array
) -> jax.Array:
    """Min-directional chamfer distance over padded point sets.

    Returns +inf-like _BIG when either cloud is empty (reference returns
    np.inf, similiarity_metrics.py:63-64).
    """
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((points1[..., :, None, :] - points2[..., None, :, :]) ** 2, axis=-1),
            0.0,
        )
    )
    pair_ok = mask1[..., :, None] & mask2[..., None, :]
    d = jnp.where(pair_ok, d, _BIG)
    n1 = jnp.maximum(jnp.sum(mask1, axis=-1), 1)
    n2 = jnp.maximum(jnp.sum(mask2, axis=-1), 1)
    d12 = jnp.sum(jnp.where(mask1, jnp.min(d, axis=-1), 0.0), axis=-1) / n1
    d21 = jnp.sum(jnp.where(mask2, jnp.min(d, axis=-2), 0.0), axis=-1) / n2
    dist = jnp.minimum(d12, d21)
    empty = (jnp.sum(mask1, axis=-1) == 0) | (jnp.sum(mask2, axis=-1) == 0)
    return jnp.where(empty, _BIG, dist)


def norm_chamfer_similarity(
    points1: jax.Array, mask1: jax.Array, points2: jax.Array, mask2: jax.Array
) -> jax.Array:
    """1 - chamfer / joint-AABB-diagonal (similiarity_metrics.py:67-88)."""
    cd = chamfer_distance(points1, mask1, points2, mask2)
    lo = jnp.minimum(
        jnp.min(jnp.where(mask1[..., None], points1, _BIG), axis=-2),
        jnp.min(jnp.where(mask2[..., None], points2, _BIG), axis=-2),
    )
    hi = jnp.maximum(
        jnp.max(jnp.where(mask1[..., None], points1, -_BIG), axis=-2),
        jnp.max(jnp.where(mask2[..., None], points2, -_BIG), axis=-2),
    )
    diag = jnp.linalg.norm(hi - lo, axis=-1)
    sim = jnp.where(diag > 0, 1.0 - cd / jnp.maximum(diag, 1e-12), 1.0)
    # reference empty-cloud semantics (similiarity_metrics.py:63-64,88):
    # chamfer(empty, X) = inf -> similarity -inf (a padded all-invalid
    # row must never look like a plausible match); BOTH empty -> the
    # reference's diag-0 branch returns 1.0
    e1 = jnp.sum(mask1, axis=-1) == 0
    e2 = jnp.sum(mask2, axis=-1) == 0
    sim = jnp.where(e1 ^ e2, -_BIG, sim)
    return jnp.where(e1 & e2, 1.0, sim)


def _psd_sqrt(A: jax.Array) -> jax.Array:
    evals, evecs = jnp.linalg.eigh(A)
    evals = jnp.clip(evals, 0.0, None)
    return jnp.einsum("...ik,...k,...jk->...ij", evecs, jnp.sqrt(evals), evecs)


def wasserstein_metric(mu1, sigma1, mu2, sigma2) -> jax.Array:
    """2-Wasserstein-style metric between Gaussians, matching the reference
    formula exactly (similiarity_metrics.py:31-44): ||mu1-mu2|| +
    tr(S1 + S2 - 2 (S2^1/2 S1 S2^1/2)^1/2). (The reference uses the norm,
    not norm^2, of the mean difference.)"""
    s2r = _psd_sqrt(sigma2)
    cross = _psd_sqrt(jnp.einsum("...ij,...jk,...kl->...il", s2r, sigma1, s2r))
    tr = jnp.trace(sigma1 + sigma2 - 2.0 * cross, axis1=-2, axis2=-1)
    return jnp.linalg.norm(mu1 - mu2, axis=-1) + tr


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Cosine similarity along the last axis; 0 when either norm ~ 0
    (matches Submap.similarity guard, map.py:149-153)."""
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    dot = jnp.sum(a * b, axis=-1)
    prod = na * nb
    return jnp.where(prod > eps, dot / jnp.maximum(prod, eps), 0.0)
