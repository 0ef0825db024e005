"""Batched, masked, weighted Arun/Umeyama point-set alignment.

TPU-native equivalent of ObjectRegistration.T_align in the reference
(roman/align/object_registration.py:88-129): given matched 3D centers,
recover the SE(3) T aligning set-2 to set-1 via SVD with reflection fix.

Unlike the reference (one python call per submap pair), this runs over an
arbitrary batch of pairs with per-correspondence validity weights, so a
whole pair grid of registrations is solved with one batched 3x3 SVD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roman_tpu.ops.se3 import make_T
from roman_tpu.utils import f32_matmuls

_EPS = 1e-9


@f32_matmuls
def arun(
    pts1: jax.Array,
    pts2: jax.Array,
    weights: jax.Array | None = None,
):
    """Weighted alignment of pts2 onto pts1.

    Args:
      pts1: (..., n, 3) target points.
      pts2: (..., n, 3) source points.
      weights: (..., n) nonnegative weights; rows with weight 0 are ignored
        (this is how padded correspondences are masked out).

    Returns:
      T: (..., 4, 4) with pts1 ~= T @ pts2.

    Matches the reference math: H = (p1-m1)^T diag(w) (p2-m2), svd(H)=U S Vh,
    R = U @ Vh with the last row of Vh negated when det < 0
    (object_registration.py:120-126); t = m1 - R m2.
    """
    if weights is None:
        weights = jnp.ones(pts1.shape[:-1], dtype=pts1.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2), _EPS)
    m1 = jnp.sum(pts1 * w, axis=-2) / wsum
    m2 = jnp.sum(pts2 * w, axis=-2) / wsum
    c1 = pts1 - m1[..., None, :]
    c2 = pts2 - m2[..., None, :]
    H = jnp.einsum("...ni,...nj->...ij", c1, c2 * w,
                   precision=jax.lax.Precision.HIGHEST)
    U, _, Vh = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vh)
    # flip last row of Vh where det == -1 (reflection case)
    flip = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], jnp.sign(det)[..., None]],
        axis=-1,
    )
    R = jnp.einsum("...ik,...k,...kj->...ij", U, flip, Vh)
    t = m1 - jnp.einsum("...ij,...j->...i", R, m2)
    return make_T(R, t)


@f32_matmuls
def umeyama_alignment(
    src: jax.Array, dst: jax.Array, with_scale: bool = False
):
    """Umeyama alignment of trajectories (used by ATE evaluation, mirroring
    evo's APE with alignment; reference roman/offline_rpgo/evaluate.py:10-53).

    Args:
      src: (n, 3), dst: (n, 3). Returns (R, t, s) with dst ~= s R src + t.
    """
    n = src.shape[0]
    mu_src = jnp.mean(src, axis=0)
    mu_dst = jnp.mean(dst, axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst
    cov = (dst_c.T @ src_c) / n
    U, D, Vh = jnp.linalg.svd(cov)
    S = jnp.ones(3, dtype=src.dtype)
    S = S.at[2].set(jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vh)))
    R = (U * S[None, :]) @ Vh
    if with_scale:
        var_src = jnp.mean(jnp.sum(src_c**2, axis=1))
        s = jnp.sum(D * S) / jnp.maximum(var_src, _EPS)
    else:
        s = jnp.asarray(1.0, dtype=src.dtype)
    t = mu_dst - s * (R @ mu_src)
    return R, t, s
