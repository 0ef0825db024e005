"""The ROMAN consistency invariant as a batched affinity-tensor builder.

Reference: the C++ ``clipperpy.invariants.ROMAN`` invariant +
``CLIPPERPairwiseAndSingle`` solver configured in
roman/align/roman_registration.py:55-96. The C++ source is not vendored in
the reference snapshot (empty submodule), so the math here is
reconstructed from the CLIPPER papers (arXiv 2011.10202, 2402.07284), the
ROMAN paper's description, and the python call surface, then validated
empirically on synthetic registration problems (see tests/test_clipper.py
and the sim benchmarks).

Scores fused per candidate-association pair (i=(a1,b1), j=(a2,b2)):

- distance consistency (pairwise): compares intra-map distances
  ||c1[a1]-c1[a2]|| vs ||c2[b1]-c2[b2]||; Gaussian kernel with scale
  ``sigma``, hard gate at ``epsilon``, and a ``mindist`` gate rejecting
  near-coincident object pairs (clipperpy EuclideanDistanceParams
  semantics, dist_reg_with_pruning.py:48-57).
- gravity-guided variant: submap frames are gravity-aligned
  (map.py:106-111), so a correct alignment is yaw-only and the *vertical
  component* of intra-map displacements must match independently of the
  horizontal norm. ``gravity_unc_ang_rad`` gives an angular slack
  (roman_registration.py:74-79).
- ratio similarity (per-association): per shape feature f (pca
  linearity/planarity/scattering, volume, sorted extent —
  roman_registration.py:98-108), min/max ratio in [0,1], gated by
  per-feature ``ratio_epsilon``; features are combined by geometric mean.
- cosine similarity (per-association): semantic-descriptor cosine clamped
  and rescaled from [cos_min, cos_max] to [0,1]
  (roman_registration.py:71-72).

Per-association scores enter the pairwise affinity through the geometric
mean of the two endpoints' scores, and fill the affinity diagonal (the
"single" consistency of CLIPPERPairwiseAndSingle).

KEY TPU DESIGN POINT: the affinity "matrix" M of size N x N
(N = n*m candidate associations) is never built by gathering — it is a
broadcast expression over small (n,n), (m,m) and (n,m) tensors, viewed as
the 4-tensor M[a1,b1,a2,b2]. This makes affinity construction a pure VPU
elementwise op and lets the whole pair grid batch on one chip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ROMANInvariantParams:
    """Mirrors clipperpy.invariants.ROMANParams (roman_registration.py:55-79)."""

    sigma: float = 0.4
    epsilon: float = 0.6
    mindist: float = 0.2
    cos_min: float = 0.85
    cos_max: float = 1.0
    ratio_epsilon: jax.Array | None = None  # (F,) per-feature gate, or None
    distance_weight: float = 1.0
    ratio_weight: float = 1.0
    cosine_weight: float = 1.0
    gravity: bool = struct.field(pytree_node=False, default=False)
    gravity_unc_ang_rad: float = 0.0872665
    fusion: str = struct.field(pytree_node=False, default="geometric_mean")
    use_ratio: bool = struct.field(pytree_node=False, default=True)
    use_cosine: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class SubmapFeatures:
    """Padded per-submap object features (struct-of-arrays).

    Built from Submap segment lists (SegmentMinimalData fields,
    segment.py:19-59): centers in the gravity-aligned submap frame, shape
    ratio features, unit semantic descriptors, and a validity mask.
    Leading batch dims allowed on every leaf.
    """

    centers: jax.Array       # (..., n, 3)
    ratio_feats: jax.Array   # (..., n, F) — F may be 0
    descriptors: jax.Array   # (..., n, D) — D may be 0
    valid: jax.Array         # (..., n) bool

    @property
    def capacity(self) -> int:
        return self.centers.shape[-2]


def ratio_similarity(r1: jax.Array, r2: jax.Array, ratio_epsilon) -> jax.Array:
    """Per-association shape-feature ratio score.

    r1 (..., n, F), r2 (..., m, F) -> (..., n, m). Per feature:
    rho = min/max in [0,1]; gated to 0 when rho < ratio_epsilon[f]
    (epsilon_shape semantics, dist_reg_with_pruning.py:84-90); combined by
    geometric mean over features.
    """
    F = r1.shape[-1]
    if F == 0:
        return jnp.ones(r1.shape[:-2] + (r1.shape[-2], r2.shape[-2]), r1.dtype)
    a = jnp.abs(r1[..., :, None, :])
    b = jnp.abs(r2[..., None, :, :])
    rho = jnp.minimum(a, b) / jnp.maximum(jnp.maximum(a, b), 1e-9)
    if ratio_epsilon is not None:
        rho = jnp.where(rho >= ratio_epsilon, rho, 0.0)
    return jnp.exp(jnp.mean(jnp.log(jnp.maximum(rho, 1e-20)), axis=-1)) * jnp.all(
        rho > 0, axis=-1
    )


def cosine_score(d1: jax.Array, d2: jax.Array, cos_min: float, cos_max: float) -> jax.Array:
    """Clamped, rescaled descriptor cosine (..., n, m).

    Associations with missing (zero) descriptors score 1.0, matching the
    reference's treatment of absent semantics (mapper.py:208-209).
    """
    D = d1.shape[-1]
    if D == 0:
        return jnp.ones(d1.shape[:-2] + (d1.shape[-2], d2.shape[-2]), d1.dtype)
    n1 = jnp.linalg.norm(d1, axis=-1)
    n2 = jnp.linalg.norm(d2, axis=-1)
    dot = jnp.einsum("...nd,...md->...nm", d1, d2)
    denom = n1[..., :, None] * n2[..., None, :]
    cos = jnp.where(denom > 1e-9, dot / jnp.maximum(denom, 1e-9), 1.0)
    missing = (n1[..., :, None] < 1e-9) | (n2[..., None, :] < 1e-9)
    score = jnp.clip((cos - cos_min) / jnp.maximum(cos_max - cos_min, 1e-9), 0.0, 1.0)
    return jnp.where(missing, 1.0, score)


def single_scores(f1: SubmapFeatures, f2: SubmapFeatures, p: ROMANInvariantParams):
    """Fused per-association score (..., n, m) plus its components."""
    comps = []
    weights = []
    if p.use_ratio and f1.ratio_feats.shape[-1] > 0:
        comps.append(ratio_similarity(f1.ratio_feats, f2.ratio_feats, p.ratio_epsilon))
        weights.append(p.ratio_weight)
    if p.use_cosine and f1.descriptors.shape[-1] > 0:
        comps.append(cosine_score(f1.descriptors, f2.descriptors, p.cos_min, p.cos_max))
        weights.append(p.cosine_weight)
    pair_valid = f1.valid[..., :, None] & f2.valid[..., None, :]
    if not comps:
        fused = jnp.ones(pair_valid.shape, f1.centers.dtype)
    else:
        fused = _fuse(comps, weights, p.fusion)
    return jnp.where(pair_valid, fused, 0.0), comps


def _fuse(comps, weights, fusion: str):
    w = jnp.asarray(weights, comps[0].dtype)
    if fusion == "arithmetic_mean":
        out = sum(wi * c for wi, c in zip(weights, comps)) / jnp.maximum(jnp.sum(w), 1e-9)
        return out * jnp.prod(jnp.stack([c > 0 for c in comps]), axis=0)
    if fusion == "product":
        out = comps[0]
        for c in comps[1:]:
            out = out * c
        return out
    # geometric mean (default; roman_registration.py FusionMethod.GEOMETRIC_MEAN)
    log_sum = sum(wi * jnp.log(jnp.maximum(c, 1e-20)) for wi, c in zip(weights, comps))
    gm = jnp.exp(log_sum / jnp.maximum(jnp.sum(w), 1e-9))
    nonzero = jnp.ones_like(comps[0], dtype=bool)
    for c in comps:
        nonzero = nonzero & (c > 0)
    return jnp.where(nonzero, gm, 0.0)


def distance_consistency(f1: SubmapFeatures, f2: SubmapFeatures, p: ROMANInvariantParams):
    """Pairwise distance-consistency tensor (..., n, m, n, m) in [0,1]."""
    c1, c2 = f1.centers, f2.centers
    diff1 = c1[..., :, None, :] - c1[..., None, :, :]  # (..., n, n, 3)
    diff2 = c2[..., :, None, :] - c2[..., None, :, :]  # (..., m, m, 3)
    D1 = jnp.linalg.norm(diff1, axis=-1)
    D2 = jnp.linalg.norm(diff2, axis=-1)

    d1 = D1[..., :, None, :, None]  # index [a1, b1, a2, b2] broadcast
    d2 = D2[..., None, :, None, :]

    if p.gravity:
        dz1 = jnp.abs(diff1[..., 2])[..., :, None, :, None]
        dz2 = jnp.abs(diff2[..., 2])[..., None, :, None, :]
        dxy1 = jnp.linalg.norm(diff1[..., :2], axis=-1)[..., :, None, :, None]
        dxy2 = jnp.linalg.norm(diff2[..., :2], axis=-1)[..., None, :, None, :]
        slack = jnp.sin(p.gravity_unc_ang_rad) * jnp.maximum(d1, d2)
        cz = jnp.maximum(jnp.abs(dz1 - dz2) - slack, 0.0)
        cxy = jnp.abs(dxy1 - dxy2)
        c = jnp.sqrt(cz**2 + cxy**2 + 1e-20)
    else:
        c = jnp.abs(d1 - d2)

    s = jnp.exp(-0.5 * (c / p.sigma) ** 2)
    s = jnp.where(c < p.epsilon, s, 0.0)
    # near-coincident object pairs are uninformative -> inconsistent
    s = jnp.where((d1 > p.mindist) & (d2 > p.mindist), s, 0.0)
    return s


def affinity(f1: SubmapFeatures, f2: SubmapFeatures, p: ROMANInvariantParams,
             dtype=jnp.float32):
    """Build the full pairwise+single affinity.

    Returns:
      M4: (..., n, m, n, m) affinity with single scores on the diagonal
          (i==j) and zeros on constraint-violating / invalid entries.
      single: (..., n, m) per-association score (the diagonal).
    """
    single, _ = single_scores(f1, f2, p)

    sd = distance_consistency(f1, f2, p)
    comps = [sd]
    weights = [p.distance_weight]
    if p.use_ratio and f1.ratio_feats.shape[-1] > 0:
        sr = ratio_similarity(f1.ratio_feats, f2.ratio_feats, p.ratio_epsilon)
        sr_pair = jnp.sqrt(
            jnp.maximum(sr[..., :, :, None, None] * sr[..., None, None, :, :], 0.0)
        )
        comps.append(sr_pair)
        weights.append(p.ratio_weight)
    if p.use_cosine and f1.descriptors.shape[-1] > 0:
        sc = cosine_score(f1.descriptors, f2.descriptors, p.cos_min, p.cos_max)
        sc_pair = jnp.sqrt(
            jnp.maximum(sc[..., :, :, None, None] * sc[..., None, None, :, :], 0.0)
        )
        comps.append(sc_pair)
        weights.append(p.cosine_weight)
    M4 = _fuse(comps, weights, p.fusion)

    n = f1.capacity
    m = f2.capacity
    eye_n = jnp.eye(n, dtype=bool)
    eye_m = jnp.eye(m, dtype=bool)
    same_a = eye_n[:, None, :, None]
    same_b = eye_m[None, :, None, :]
    conflict = jnp.logical_xor(same_a, same_b)  # one-to-one violation
    diag = same_a & same_b

    valid4 = (
        (f1.valid[..., :, None, None, None] & f2.valid[..., None, :, None, None])
        & (f1.valid[..., None, None, :, None] & f2.valid[..., None, None, None, :])
    )
    M4 = jnp.where(conflict | diag | ~valid4, 0.0, M4)
    M4 = M4 + jnp.where(
        diag & valid4, single[..., :, :, None, None] * jnp.ones_like(M4), 0.0
    )
    return M4.astype(dtype), single
