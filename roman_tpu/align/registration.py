"""Batched object-map registration: ROMAN / distance-CLIPPER /
clipper+prune / RANSAC methods over grids of submap pairs.

Equivalent of the reference registration class family
(roman/align/object_registration.py, roman_registration.py,
dist_reg_with_pruning.py, ransac_reg.py) and of the method factory in
roman/params/submap_align_params.py:86-150 — but instead of one
python+C++ solve per pair, each method is a pure function over batched
SubmapFeatures that registers every pair in one jit'd program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from roman_tpu.align import clipper as clipper_mod
from roman_tpu.align import invariants
from roman_tpu.align.invariants import ROMANInvariantParams, SubmapFeatures
from roman_tpu.ops.arun import arun
from roman_tpu.ops.se3 import T_to_xyzrpy

# methods sharing the ROMAN invariant machinery, and which feature blocks
# they enable (submap_align_params.py:98-116)
_ROMAN_FAMILY = {
    #            gravity  volume  extent  pca    semantics
    "clipper":       (False, False, False, False, False),
    "gravity":       (True,  False, False, False, False),
    "pcavolgrav":    (True,  True,  False, True,  False),
    "extentvolgrav": (True,  True,  True,  False, False),
    "roman":         (True,  True,  False, True,  True),
    "sevg":          (True,  True,  True,  False, True),
    "spv":           (False, True,  False, True,  True),
    "semanticgrav":  (True,  False, False, False, True),
}
_METHOD_ALIASES = {"spvg": "roman", "roman_no_semantics": "pcavolgrav"}


@dataclasses.dataclass
class RegistrationConfig:
    """Host-level (static) registration configuration."""

    method: str = "roman"
    dim: int = 3
    fusion: str = "geometric_mean"
    sigma: float = 0.4
    epsilon: float = 0.6
    mindist: float = 0.2
    epsilon_shape: float = 0.0
    cos_min: float = 0.85
    cos_max: float = 1.0
    gravity_unc_ang_rad: float = 0.0872665
    roll_pitch_thresh: float = float(np.deg2rad(5))
    ransac_iter: int = 4096
    max_clique: int = 64
    # explicit (gravity, volume, extent, pca, semantics) flags; when set
    # they override the method table, supporting arbitrary feature
    # combinations like the reference's additive ratio_feature_dim
    # (roman_registration.py:55-70)
    feature_overrides: Optional[tuple] = None
    # fused VMEM-resident pallas register kernel. None = auto: enabled on
    # TPU backends (where it is ~2x the XLA path), disabled elsewhere.
    # PairGridRegistrar additionally falls back to the XLA path at
    # dispatch time if the kernel fails to compile (e.g. VMEM overflow
    # at large submap capacity).
    use_pallas: Optional[bool] = None
    pallas_pairs_per_step: int = 4  # pairs per kernel grid step (v5e sweep:
    # K=2 1481, K=4 1685, K=5 1689, K=6 1589 pairs/s; 8 overflows VMEM)
    pallas_interpret: bool = False  # pallas interpret mode (CPU testing)
    solver: clipper_mod.ClipperSolveParams = dataclasses.field(
        default_factory=clipper_mod.ClipperSolveParams
    )

    def __post_init__(self):
        self.method = _METHOD_ALIASES.get(self.method, self.method)

    @property
    def feature_flags(self):
        """(gravity, volume, extent, pca, semantics) governing which
        blocks build_features PACKS. clipper+prune packs shape attrs and
        descriptors so the candidate-list pruning can see them; whether
        the INVARIANT consumes them is solve_flags' business."""
        if self.feature_overrides is not None:
            return tuple(self.feature_overrides)
        if self.method in _ROMAN_FAMILY:
            return _ROMAN_FAMILY[self.method]
        if self.method == "clipper+prune":
            return (False, True, False, True, True)
        return (False, False, False, False, False)  # ransac: centers only

    @property
    def solve_flags(self):
        """(gravity, use_ratio, use_cosine) the invariant applies at
        solve time. clipper+prune prunes the association list by shape
        ratio / cosine and then solves a PLAIN Euclidean-distance
        CLIPPER — no gravity-guided distance, no ratio/cosine terms
        (reference dist_reg_with_pruning.py:49-57; gravity enters only
        as the post-hoc roll/pitch check)."""
        if self.method == "clipper+prune":
            return (False, False, False)
        gravity, volume, extent, pca, semantics = self.feature_flags
        return (gravity, volume or extent or pca, semantics)

    def pallas_enabled(self) -> bool:
        """Resolve use_pallas=None (auto) against the active backend."""
        if self.use_pallas is not None:
            return self.use_pallas
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def invariant_params(self, n_ratio_feats: int) -> ROMANInvariantParams:
        gravity, use_ratio, use_cosine = self.solve_flags
        use_ratio = use_ratio and n_ratio_feats > 0
        return ROMANInvariantParams(
            sigma=self.sigma,
            epsilon=self.epsilon,
            mindist=self.mindist,
            cos_min=self.cos_min,
            cos_max=self.cos_max,
            ratio_epsilon=(
                jnp.full((n_ratio_feats,), self.epsilon_shape)
                if use_ratio
                else None
            ),
            gravity=gravity,
            gravity_unc_ang_rad=self.gravity_unc_ang_rad,
            fusion=self.fusion,
            use_ratio=use_ratio,
            use_cosine=use_cosine,
        )


@struct.dataclass
class RegistrationResult:
    sel: jax.Array      # (..., n, m) bool selected associations
    count: jax.Array    # (...,) int32 number of associations
    T_align: jax.Array  # (..., 4, 4) aligns map2 -> map1 (T_align semantics,
                        # object_registration.py:88-129)
    ok: jax.Array       # (...,) bool: count >= dim (else the reference raises
                        # InsufficientAssociationsException, :106-108)
    u: Optional[jax.Array]  # (..., n, m) solver eigenvector, or None after
                            # the host fetch drops it (PairGridRegistrar)
    score: jax.Array    # (...,) clique objective
    converged: Optional[jax.Array] = None  # (...,) bool: homotopy finished
    # with no active one-to-one constraint violations. False flags a pair
    # whose fixed iteration budget ran out mid-homotopy (the eigenvector
    # can localize on a single node, losing a genuine sparse match the
    # serial full-budget solver finds); such pairs are re-solved at
    # RESCUE_SOLVER budget by PairGridRegistrar / register_clipper_rescued.
    # None for solvers without a homotopy (ransac).


def build_features(
    centers: jax.Array,
    valid: jax.Array,
    cfg: RegistrationConfig,
    pca_attrs: Optional[jax.Array] = None,   # (..., n, 3) lin/plan/scat
    volume: Optional[jax.Array] = None,      # (..., n)
    extent: Optional[jax.Array] = None,      # (..., n, 3)
    descriptors: Optional[jax.Array] = None,  # (..., n, D)
) -> SubmapFeatures:
    """Assemble the per-object feature layout of
    ROMANRegistration._object_to_clipper_list (roman_registration.py:98-108):
    [pca(3)] + [volume(1)] + [sorted extent(3)] as ratio features, plus the
    semantic descriptor block."""
    _, use_volume, use_extent, use_pca, use_sem = cfg.feature_flags
    blocks = []
    if use_pca:
        blocks.append(pca_attrs)
    if use_volume:
        blocks.append(volume[..., None])
    if use_extent:
        blocks.append(jnp.sort(extent, axis=-1))
    ratio = (
        jnp.concatenate(blocks, axis=-1)
        if blocks
        else jnp.zeros(centers.shape[:-1] + (0,), centers.dtype)
    )
    desc = (
        descriptors
        if (use_sem and descriptors is not None)
        else jnp.zeros(centers.shape[:-1] + (0,), centers.dtype)
    )
    return SubmapFeatures(
        centers=centers, ratio_feats=ratio, descriptors=desc, valid=valid
    )


def _t_align_from_selection(f1, f2, sel):
    """Batched Arun over selected center correspondences. sel (..., n, m)."""
    n, m = sel.shape[-2], sel.shape[-1]
    pts1 = jnp.broadcast_to(
        f1.centers[..., :, None, :], sel.shape + (3,)
    ).reshape(sel.shape[:-2] + (n * m, 3))
    pts2 = jnp.broadcast_to(
        f2.centers[..., None, :, :], sel.shape + (3,)
    ).reshape(sel.shape[:-2] + (n * m, 3))
    w = sel.reshape(sel.shape[:-2] + (n * m,)).astype(pts1.dtype)
    return arun(pts1, pts2, w)


# Generous budget for re-solving the rare pairs whose homotopy did not
# converge within the default (8,6,6) budget (hard instances: heavy
# odometry drift leaves a sparse-but-strong genuine subgraph the penalty
# ascent needs more outer steps to isolate — on a drift-1.0m adversarial
# sweep the unconverged eigenvector localized on one node, count=1, while
# the serial referee's (10,12,10) found the genuine 4-set). Unconverged
# pairs are ~0% of clean grids and <=18% under the heaviest nuisance, so
# the rescue re-solve costs nothing at the grid level.
RESCUE_SOLVER = clipper_mod.ClipperSolveParams(
    warmup_iters=16, outer_iters=16, inner_iters=12)


def rescue_solver(solver: clipper_mod.ClipperSolveParams
                  ) -> clipper_mod.ClipperSolveParams:
    """RESCUE_SOLVER's iteration budget, inheriting the exploration
    knobs of the active solver. Rescue exists precisely for the pairs
    where the homotopy localized in a bad basin, so a user-requested
    n_restarts must keep applying there — a fixed single-start rescue
    would silently disable the knob on exactly the hard pairs it was
    turned on for."""
    return dataclasses.replace(RESCUE_SOLVER, n_restarts=solver.n_restarts)


def _homotopy_converged(u: jax.Array,
                        solver: clipper_mod.ClipperSolveParams) -> jax.Array:
    """True where the projected-power-iteration homotopy finished: no
    entry of u is both active and in violation of the one-to-one
    constraint (the same `viol` predicate the penalty-increase step uses,
    evaluated on the final u). Needs no affinity matvec — the constraint
    product is rank-structured (rowsum+colsum-2u)."""
    Cbu = clipper_mod._cb_matvec(u)
    viol = (u > solver.active_eps) & (Cbu > solver.active_eps)
    return ~jnp.any(viol, axis=(-2, -1))


def splice_rescued(res: RegistrationResult, res2: RegistrationResult,
                   bad: np.ndarray) -> RegistrationResult:
    """Overwrite rows `bad` of `res` with the re-solved `res2` (leafwise;
    None leaves pass through). The ONE rescue-splice rule, shared by the
    eager path below and PairGridRegistrar._apply_rescue — rescue policy
    edits must not be able to land in only one of them."""

    def splice(a, b):
        if a is None or b is None:
            return a
        out = np.asarray(a).copy()
        out[bad] = np.asarray(b)
        return out

    return jax.tree.map(splice, res, res2)


def register_clipper_rescued(f1: SubmapFeatures, f2: SubmapFeatures,
                             cfg: RegistrationConfig) -> RegistrationResult:
    """Eager (host-level) register_clipper + rescue: pairs whose homotopy
    ran out of budget are re-solved once at RESCUE_SOLVER budget and
    spliced back. For the chunked/jitted pipeline the same rescue lives in
    PairGridRegistrar.__call__ (data-dependent re-dispatch cannot be
    traced). Batch must be 1-D."""
    res = register_clipper(f1, f2, cfg)
    conv = np.asarray(res.converged)
    bad = np.flatnonzero(~conv)
    if bad.size == 0:
        return res
    rcfg = dataclasses.replace(cfg, solver=rescue_solver(cfg.solver),
                               use_pallas=False)
    take = lambda x: None if x is None else x[jnp.asarray(bad)]
    res2 = register_clipper(jax.tree.map(take, f1), jax.tree.map(take, f2),
                            rcfg)
    return splice_rescued(res, res2, bad)


def register_clipper(f1: SubmapFeatures, f2: SubmapFeatures, cfg: RegistrationConfig,
                     assoc_mask: Optional[jax.Array] = None) -> RegistrationResult:
    """ROMAN-family registration (also used by clipper+prune with an
    assoc_mask). Batched over leading dims of f1/f2.

    With cfg.use_pallas, the whole affinity+solve+round+refine pipeline
    runs as one VMEM-resident pallas kernel (fused_register.py) — the
    (N, N) affinity never touches HBM. Geometric-mean fusion only; other
    fusion modes fall back to the XLA path."""
    if cfg.pallas_enabled() and cfg.fusion == "geometric_mean":
        from roman_tpu.align import fused_register as fr

        gravity, use_ratio, use_cosine = cfg.solve_flags
        inv = fr.FusedInvariantStatics(
            sigma=cfg.sigma, epsilon=cfg.epsilon, mindist=cfg.mindist,
            cos_min=cfg.cos_min, cos_max=cfg.cos_max,
            eps_shape=cfg.epsilon_shape,
            gravity=gravity, gravity_unc_ang_rad=cfg.gravity_unc_ang_rad,
            use_ratio=use_ratio and f1.ratio_feats.shape[-1] > 0,
            use_cosine=use_cosine and f1.descriptors.shape[-1] > 0,
            max_clique=cfg.max_clique,
        )
        sel, count, u, F = fr.fused_register(
            f1, f2, inv, cfg.solver, assoc_mask=assoc_mask,
            pairs_per_step=cfg.pallas_pairs_per_step,
            interpret=cfg.pallas_interpret,
        )
        T = _t_align_from_selection(f1, f2, sel)
        return RegistrationResult(sel=sel, count=count, T_align=T,
                                  ok=count >= cfg.dim, u=u, score=F,
                                  converged=_homotopy_converged(u, cfg.solver))
    p = cfg.invariant_params(f1.ratio_feats.shape[-1])
    M4, _ = invariants.affinity(f1, f2, p)
    valid = f1.valid[..., :, None] & f2.valid[..., None, :]
    if assoc_mask is not None:
        valid = valid & assoc_mask
        keep = (
            assoc_mask[..., :, :, None, None] & assoc_mask[..., None, None, :, :]
        )
        M4 = jnp.where(keep, M4, 0.0)
    max_clique = min(cfg.max_clique, min(f1.capacity, f2.capacity))
    sel, count, u, F = clipper_mod.solve_and_round(
        M4, valid, max_clique, cfg.solver, use_pallas=cfg.pallas_enabled())
    T = _t_align_from_selection(f1, f2, sel)
    ok = count >= cfg.dim
    return RegistrationResult(sel=sel, count=count, T_align=T, ok=ok, u=u,
                              score=F,
                              converged=_homotopy_converged(u, cfg.solver))


def get_MCA(f1: SubmapFeatures, f2: SubmapFeatures, cfg: RegistrationConfig):
    """Affinity M (N,N), constraint C (N,N), and the all-to-all association
    list A (N,2) — the ObjectRegistration.get_MCA surface
    (object_registration.py:50-55). C is materialized here only for API
    parity; the solver never builds it."""
    p = cfg.invariant_params(f1.ratio_feats.shape[-1])
    M4, _ = invariants.affinity(f1, f2, p)
    n, m = f1.capacity, f2.capacity
    N = n * m
    M = M4.reshape(M4.shape[:-4] + (N, N))
    a = jnp.arange(N) // m
    b = jnp.arange(N) % m
    conflict = (a[:, None] == a[None, :]) ^ (b[:, None] == b[None, :])
    C = (~conflict).astype(jnp.float32)
    A = jnp.stack([a, b], axis=-1)
    return M, C, A


def mno_clipper(f1: SubmapFeatures, f2: SubmapFeatures, cfg: RegistrationConfig,
                num_solutions: int = 2):
    """Multiple non-overlapping CLIPPER solutions: solve, zero out the
    solved clique's rows/cols in M, re-solve (object_registration.py:57-86).
    Returns a list of (sel_mask, count, score)."""
    p = cfg.invariant_params(f1.ratio_feats.shape[-1])
    M4, _ = invariants.affinity(f1, f2, p)
    valid = f1.valid[..., :, None] & f2.valid[..., None, :]
    max_clique = min(cfg.max_clique, min(f1.capacity, f2.capacity))
    solutions = []
    for _ in range(num_solutions):
        sel, count, u, F = clipper_mod.solve_and_round(M4, valid, max_clique,
                                                       cfg.solver)
        solutions.append((sel, count, F))
        # zero the solved associations' rows/cols for the next solution
        picked = sel
        keep = ~(picked[..., :, :, None, None] | picked[..., None, None, :, :])
        M4 = jnp.where(keep, M4, 0.0)
        valid = valid & ~picked
    return solutions


def register_clipper_prune(f1: SubmapFeatures, f2: SubmapFeatures,
                           cfg: RegistrationConfig,
                           pca_attrs1=None, volume1=None,
                           pca_attrs2=None, volume2=None,
                           descriptors1=None, descriptors2=None) -> RegistrationResult:
    """clipper+prune baseline (dist_reg_with_pruning.py): Euclidean-distance
    CLIPPER over candidates pre-pruned by descriptor cosine < cos_min and
    shape-attribute min/max ratio < epsilon_shape; post-hoc gravity check
    marks results with large roll/pitch as failed (GravityConstraintError)."""
    assoc = f1.valid[..., :, None] & f2.valid[..., None, :]
    if descriptors1 is not None and descriptors2 is not None:
        cos = jnp.einsum("...nd,...md->...nm", descriptors1, descriptors2)
        assoc = assoc & (cos >= cfg.cos_min)
    if volume1 is not None and pca_attrs1 is not None:
        sa1 = jnp.concatenate([volume1[..., None], pca_attrs1], axis=-1)
        sa2 = jnp.concatenate([volume2[..., None], pca_attrs2], axis=-1)
        a = jnp.abs(sa1[..., :, None, :])
        b = jnp.abs(sa2[..., None, :, :])
        rho = jnp.minimum(a, b) / jnp.maximum(jnp.maximum(a, b), 1e-9)
        assoc = assoc & jnp.all(rho >= cfg.epsilon_shape, axis=-1)
    res = register_clipper(f1, f2, cfg, assoc_mask=assoc)
    rpy = T_to_xyzrpy(res.T_align)[..., 3:]
    grav_ok = (jnp.abs(rpy[..., 0]) < cfg.roll_pitch_thresh) & (
        jnp.abs(rpy[..., 1]) < cfg.roll_pitch_thresh
    )
    return res.replace(ok=res.ok & grav_ok)


def register_ransac(f1: SubmapFeatures, f2: SubmapFeatures, cfg: RegistrationConfig,
                    key: jax.Array,
                    max_corr_dist: float = 0.5,
                    edge_len: float = 0.95) -> RegistrationResult:
    """RANSAC baseline over object centers with edge-length check
    (ransac_reg.py:43-51, o3d registration_ransac_based_on_correspondence
    semantics), fully batched: S static hypothesis triplets per pair.
    """
    batch = f1.centers.shape[:-2]
    n, m = f1.capacity, f2.capacity
    S = cfg.ransac_iter

    valid_pairs = f1.valid[..., :, None] & f2.valid[..., None, :]
    # sample candidate associations proportionally among valid ones
    logits = jnp.where(valid_pairs, 0.0, -1e9).reshape(batch + (n * m,))
    cand = jax.random.categorical(key, logits, axis=-1, shape=(S, 3) + batch)
    cand = jnp.moveaxis(cand.reshape((S, 3) + batch), (0, 1), (-2, -1))  # (..., S, 3)
    a = cand // m  # (..., S, 3)
    b = cand % m

    def gather_pts(centers, idx):
        # centers (..., k, 3), idx (..., S, 3) -> (..., S, 3pts, 3)
        return jnp.take_along_axis(
            centers[..., None, :, :], idx[..., None], axis=-2
        )

    c1 = gather_pts(f1.centers, a)
    c2 = gather_pts(f2.centers, b)

    # edge-length checker: corresponding triangle edges must have similar length
    def edges(c):
        return jnp.stack(
            [
                jnp.linalg.norm(c[..., 0, :] - c[..., 1, :], axis=-1),
                jnp.linalg.norm(c[..., 1, :] - c[..., 2, :], axis=-1),
                jnp.linalg.norm(c[..., 0, :] - c[..., 2, :], axis=-1),
            ],
            axis=-1,
        )
    e1, e2 = edges(c1), edges(c2)
    emin = jnp.minimum(e1, e2)
    emax = jnp.maximum(e1, e2)
    edge_ok = jnp.all(emin > edge_len * emax, axis=-1)  # (..., S)

    T_h = arun(c1, c2)  # (..., S, 4, 4) aligns c2 -> c1

    # score hypotheses in chunks to bound the (..., chunk, n, m) tensor
    # (a single (..., S, n, m) buffer is O(GB) for realistic S)
    CHUNK = min(S, 128)
    n_chunks = (S + CHUNK - 1) // CHUNK
    S_pad = n_chunks * CHUNK
    T_pad = jnp.concatenate(
        [T_h, jnp.broadcast_to(jnp.eye(4, dtype=T_h.dtype), batch + (S_pad - S, 4, 4))],
        axis=-3,
    )
    edge_ok_pad = jnp.concatenate(
        [edge_ok, jnp.zeros(batch + (S_pad - S,), bool)], axis=-1
    )
    T_chunks = jnp.moveaxis(
        T_pad.reshape(batch + (n_chunks, CHUNK, 4, 4)), len(batch), 0
    )  # (n_chunks, ..., CHUNK, 4, 4)
    ok_chunks = jnp.moveaxis(
        edge_ok_pad.reshape(batch + (n_chunks, CHUNK)), len(batch), 0
    )

    def score_chunk(args):
        T_c, ok_c = args  # (..., CHUNK, 4, 4), (..., CHUNK)
        p2t = jnp.einsum(
            "...sij,...mj->...smi", T_c[..., :3, :3], f2.centers
        ) + T_c[..., None, :3, 3]
        d = jnp.linalg.norm(
            f1.centers[..., None, :, None, :] - p2t[..., None, :, :], axis=-1
        )  # (..., CHUNK, n, m)
        inl = (d < max_corr_dist) & valid_pairs[..., None, :, :]
        cnt = jnp.sum(inl, axis=(-2, -1)) * ok_c  # (..., CHUNK)
        best_local = jnp.argmax(cnt, axis=-1)
        best_cnt = jnp.take_along_axis(cnt, best_local[..., None], axis=-1)[..., 0]
        best_T = jnp.take_along_axis(
            T_c, best_local[..., None, None, None].astype(jnp.int32), axis=-3
        )[..., 0, :, :]
        return best_cnt, best_T

    cnts, Ts = jax.lax.map(score_chunk, (T_chunks, ok_chunks))
    best_chunk = jnp.argmax(cnts, axis=0)  # (...,)
    T_best = jnp.take_along_axis(
        jnp.moveaxis(Ts, 0, len(batch)),
        best_chunk[..., None, None, None].astype(jnp.int32), axis=len(batch),
    )[..., 0, :, :]

    # final inlier set under the best hypothesis
    p2t = jnp.einsum("...ij,...mj->...mi", T_best[..., :3, :3], f2.centers) + T_best[
        ..., None, :3, 3
    ]
    d_best = jnp.linalg.norm(f1.centers[..., :, None, :] - p2t[..., None, :, :], axis=-1)
    sel_all = (d_best < max_corr_dist) & valid_pairs
    u_like = jnp.where(sel_all, 1.0 / (1.0 + d_best), 0.0)
    sel, count = clipper_mod.round_greedy(
        u_like, jnp.full(batch, min(n, m), jnp.float32), min(cfg.max_clique, min(n, m))
    )
    T = _t_align_from_selection(f1, f2, sel)
    return RegistrationResult(
        sel=sel, count=count, T_align=T, ok=count >= cfg.dim, u=u_like,
        score=count.astype(jnp.float32),
    )
