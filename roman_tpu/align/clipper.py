"""Batched CLIPPER densest-clique solver (projected power iteration with
constraint-penalty homotopy) for all-to-all object association.

Re-implements the C++ CLIPPER solver (mit-acl/clipper, used through
clipperpy at reference roman/align/object_registration.py:22-29) from the
papers (arXiv 2011.10202, 2402.07284) as a fixed-iteration, static-shape
JAX program that vmaps over an entire grid of submap pairs.

CLIPPER relaxes maximum-weight-clique over the association consistency
graph to  max_u u^T M u  s.t. u >= 0, ||u|| = 1, u_i u_j = 0 where C_ij=0,
and solves it by gradient ascent on the penalized matrix
M_d = M - d * Cb (Cb = complement of the constraint matrix), projecting
onto the nonnegative sphere while homotopy-increasing the penalty d until
no active constraint violations remain; the solution is rounded to the
clique by taking the omega = round(u^T M_d u) largest entries of u.

TWO TPU-SPECIFIC STRUCTURAL WINS versus a literal port:

1. The constraint matrix is never materialized. For all-to-all
   associations (clipperpy.utils.create_all_to_all,
   object_registration.py:41), two associations conflict iff they share
   exactly one endpoint, so with u viewed as a (n, m) matrix U:
       (Cb u)[a,b] = rowsum(U)[a] + colsum(U)[b] - 2 U[a,b]
   — an O(nm) rank-structured product instead of an O(n^2 m^2) matmul.

2. The affinity M is built once as a broadcast 4-tensor (invariants.py)
   and every power iteration is a single (N,N)@(N,) matmul batched over
   all pairs on the MXU; the reference runs one Eigen solve per pair on a
   CPU (submap_align.py:93-157).

Rounding is greedy-feasible (row/col occupancy masks) rather than plain
top-omega, which guarantees a one-to-one matching without a constraint
matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_EPS = 1e-9


@struct.dataclass
class ClipperSolveParams:
    # iteration budget: v5e sweep over (warmup, outer, inner) with the
    # serial full-budget baseline as quality referee — (10,12,10) 1718,
    # (10,8,8) 1995, (8,6,6) 2180, (6,4,4) 2002 pairs/s, association-set
    # Jaccard / LC-decision agreement / subset P-R identical at every
    # budget, so the default keeps one notch of margin above the knee
    warmup_iters: int = struct.field(pytree_node=False, default=8)
    outer_iters: int = struct.field(pytree_node=False, default=6)
    inner_iters: int = struct.field(pytree_node=False, default=6)
    active_eps: float = 1e-6
    # multi-restart homotopy: the projected power iteration with penalty
    # homotopy is nonconvex — a hard instance (sparse genuine subgraph
    # under heavy odometry drift) can localize the eigenvector on a
    # single node. n_restarts > 1 runs R perturbed copies of the warmed
    # start through the SAME homotopy (restart_inits) and keeps the
    # feasible solution with the largest unpenalized omega = u'Mu. The
    # MXU pays for a full tile of matvec rows whether 1 or R are live
    # ((R, N) x (N, N) streams the matrix once), so restarts are nearly
    # free in wall clock (see docs/PERF.md).
    n_restarts: int = struct.field(pytree_node=False, default=1)


def restart_noise(n_restarts: int, N: int):
    """Deterministic nonnegative (R, N) f32 init noise for multi-restart
    homotopy. Row 0 is all zeros (restart 0 reproduces the single-start
    trajectory); rows 1..R-1 are uniform [0, 1) from a FIXED seed. The
    XLA engine, the standalone pallas solve kernel and the fused register
    kernel all consume this exact array, so a restart sweep is
    reproducible and the engines stay comparable."""
    import numpy as np

    rng = np.random.default_rng(0x5EED)
    z = rng.uniform(size=(n_restarts, N)).astype(np.float32)
    z[0] = 0.0
    return z


def _cb_matvec(U: jax.Array) -> jax.Array:
    """(Cb u) for the all-to-all one-to-one constraint structure.

    U: (..., n, m) nonnegative. Returns (..., n, m).
    """
    rows = jnp.sum(U, axis=-1, keepdims=True)
    cols = jnp.sum(U, axis=-2, keepdims=True)
    return rows + cols - 2.0 * U


def _normalize(u: jax.Array) -> jax.Array:
    nrm = jnp.sqrt(jnp.sum(u * u, axis=(-2, -1), keepdims=True))
    return u / jnp.maximum(nrm, _EPS)


def solve(M4: jax.Array, valid: jax.Array, params: ClipperSolveParams = ClipperSolveParams()):
    """Solve the densest-clique relaxation.

    Args:
      M4: (..., n, m, n, m) affinity (invariants.affinity output). Diagonal
        holds single-association scores; conflicts/invalid already zeroed.
      valid: (..., n, m) bool mask of real (non-padding) associations.
      params: iteration budget (static).

    Returns:
      u: (..., n, m) solution vector (nonnegative, unit norm).
      d: (..., ) final penalty.
      F: (..., ) final objective u^T M_d u (clique-size estimate).
    """
    M = prepare_matrix(M4)
    return solve_2d(M, M4.shape[-4], M4.shape[-3], valid, params)


def prepare_matrix(M4: jax.Array) -> jax.Array:
    """Materialize the (N, N) bf16 affinity once.

    The affinity is read ~150x by the power iterations and again by the
    refinement pass; it is the HBM bandwidth bottleneck, so it is stored
    bf16 and f32-accumulated. The optimization barrier forces XLA to
    materialize it — without it the broadcast affinity expression gets
    rematerialized inside every scan iteration (measured 3.5x slower).
    """
    batch = M4.shape[:-4]
    N = M4.shape[-4] * M4.shape[-3]
    M = M4.reshape(batch + (N, N)).astype(jnp.bfloat16)
    return jax.lax.optimization_barrier(M)


def solve_2d(M: jax.Array, n: int, m: int, valid: jax.Array,
             params: ClipperSolveParams = ClipperSolveParams()):
    batch = M.shape[:-2]
    N = n * m
    validf = valid.astype(jnp.float32)
    R = params.n_restarts

    def m_matvec(U):
        # U: batch + (n, m), or batch + (R, n, m) during a multi-restart
        # homotopy. Either way M is streamed ONCE per pair: the restart
        # rows ride as extra matmul columns (batch + (N, R) right
        # operand), which the MXU pays for whether 1 or R are live.
        multi = U.ndim == len(batch) + 3
        lead = U.shape[:-2]
        if multi:
            u = jnp.swapaxes(U.reshape(lead + (N,)), -1, -2)  # batch+(N, R)
        else:
            u = U.reshape(lead + (N,))[..., None]             # batch+(N, 1)
        r = jnp.matmul(M, u.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        if multi:
            return jnp.swapaxes(r, -1, -2).reshape(lead + (n, m))
        return r[..., 0].reshape(lead + (n, m))

    # --- warm start: shifted power iteration toward the Perron vector ---
    U = _normalize(validf + 1e-3)

    def warm_body(U, _):
        U = _normalize((m_matvec(U) + U) * validf)
        return U, None

    U, _ = jax.lax.scan(warm_body, U, None, length=params.warmup_iters)

    # --- multi-restart expansion (ClipperSolveParams.n_restarts) -------
    # restart r blends the warmed start toward a deterministic noise
    # vector: u_r = normalize((u_warm (1 - a_r) + umax a_r z_r) valid),
    # a_r = r / R. Row 0 keeps u_warm VERBATIM (bit-identical to the
    # single-start trajectory); the others explore progressively farther
    # basins of the nonconvex homotopy. Identical formula + noise in the
    # pallas kernels (clipper_pallas / fused_register).
    if R > 1:
        noise = jnp.asarray(restart_noise(R, N)).reshape((R, n, m))
        a = (jnp.arange(R, dtype=jnp.float32) / R)[:, None, None]
        umax = jnp.max(U, axis=(-2, -1), keepdims=True)
        pert = _normalize(
            (U[..., None, :, :] * (1.0 - a) + umax[..., None, :, :] * a * noise)
            * validf[..., None, :, :])
        U = jnp.where(a == 0.0, U[..., None, :, :], pert)
        validf_h = validf[..., None, :, :]
        d0 = jnp.zeros(batch + (R,), jnp.float32)
    else:
        validf_h = validf
        d0 = jnp.zeros(batch, jnp.float32)

    # --- homotopy: projected power iterations on M - d*Cb ---
    def outer_body(carry, _):
        U, d = carry

        def inner_body(U, _):
            g = m_matvec(U) - d[..., None, None] * _cb_matvec(U)
            Unew = jnp.maximum(g, 0.0) * validf_h
            nrm = jnp.sqrt(jnp.sum(Unew * Unew, axis=(-2, -1), keepdims=True))
            Unew = jnp.where(nrm > _EPS, Unew / jnp.maximum(nrm, _EPS), U)
            return Unew, None

        U, _ = jax.lax.scan(inner_body, U, None, length=params.inner_iters)

        # penalty increase: d += E[ (M u)_i / (Cb u)_i ] over active violations
        Mu = m_matvec(U)
        Cbu = _cb_matvec(U)
        viol = (U > params.active_eps) & (Cbu > params.active_eps)
        num = jnp.sum(jnp.where(viol, Mu, 0.0), axis=(-2, -1))
        den = jnp.sum(jnp.where(viol, Cbu, 0.0), axis=(-2, -1))
        delta = jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)
        d = d + delta + jnp.where(jnp.any(viol, axis=(-2, -1)), 1e-3, 0.0)
        return (U, d), None

    (U, d), _ = jax.lax.scan(outer_body, (U, d0), None, length=params.outer_iters)

    if R > 1:
        # keep the restart with the best feasible unpenalized omega =
        # u'Mu (the solver's clique-size estimate); restarts still in
        # violation score -BIG so any feasible row beats every infeasible
        # one. First-max tie-break prefers the unperturbed restart 0.
        Mu = m_matvec(U)
        Cbu = _cb_matvec(U)
        omega = jnp.sum(U * Mu, axis=(-2, -1))
        anyviol = jnp.any((U > params.active_eps) & (Cbu > params.active_eps),
                          axis=(-2, -1))
        F_all = jnp.sum(U * (Mu - d[..., None, None] * Cbu), axis=(-2, -1))
        score = omega - 1e30 * anyviol.astype(jnp.float32)
        best = jnp.argmax(score, axis=-1)
        U = jnp.take_along_axis(
            U, best[..., None, None, None], axis=-3)[..., 0, :, :]
        d = jnp.take_along_axis(d, best[..., None], axis=-1)[..., 0]
        F = jnp.take_along_axis(F_all, best[..., None], axis=-1)[..., 0]
        return U, d, F

    Mdu = m_matvec(U) - d[..., None, None] * _cb_matvec(U)
    F = jnp.sum(U * Mdu, axis=(-2, -1))
    return U, d, F


def round_greedy(u: jax.Array, omega: jax.Array, max_steps: int,
                 rel_thresh: float = 0.35):
    """Greedy-feasible rounding of the solution vector.

    Selects associations in decreasing u order while maintaining
    one-to-one row/col feasibility, stopping when u_i falls below
    rel_thresh * max(u). The eigenvector of the penalized affinity
    localizes on the densest clique with comparable magnitudes and decays
    sharply off-clique, so a relative cut is scale-invariant — unlike the
    CLIPPER paper's omega = round(u^T M_d u) estimate, which systematically
    under-selects when inlier affinities average below 1 (real maps with
    drift/duplicate segments) and is meaningless when the penalized
    objective goes negative. `omega` is kept as an additional upper bound
    when finite and positive.

    Args:
      u: (..., n, m) nonnegative solution.
      omega: (...,) optional clique-size cap (pass +inf to disable).
      max_steps: static upper bound on clique size (e.g. min(n, m)).

    Returns:
      sel: (..., n, m) bool selection mask; count: (...,) int32.
    """
    batch = u.shape[:-2]
    n, m = u.shape[-2], u.shape[-1]
    u_max = jnp.max(u, axis=(-2, -1))
    cut = rel_thresh * u_max
    target = jnp.where(
        omega > 0, jnp.clip(jnp.round(omega * 2.0), 1, max_steps), max_steps
    ).astype(jnp.int32)

    def body(carry, _):
        row_free, col_free, sel, count = carry
        cand = jnp.where(row_free[..., :, None] & col_free[..., None, :], u, -1.0)
        flat = cand.reshape(batch + (n * m,))
        idx = jnp.argmax(flat, axis=-1)
        val = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
        a = idx // m
        b = idx % m
        take = (val > cut) & (val > 0.0) & (count < target)
        onehot_a = jax.nn.one_hot(a, n, dtype=bool)
        onehot_b = jax.nn.one_hot(b, m, dtype=bool)
        pick = onehot_a[..., :, None] & onehot_b[..., None, :]
        sel = sel | (pick & take[..., None, None])
        row_free = row_free & ~(onehot_a & take[..., None])
        col_free = col_free & ~(onehot_b & take[..., None])
        count = count + take.astype(jnp.int32)
        return (row_free, col_free, sel, count), None

    init = (
        jnp.ones(batch + (n,), bool),
        jnp.ones(batch + (m,), bool),
        jnp.zeros(batch + (n, m), bool),
        jnp.zeros(batch, jnp.int32),
    )
    (_, _, sel, count), _ = jax.lax.scan(body, init, None, length=max_steps)
    return sel, count


def refine_selection(M4: jax.Array, sel: jax.Array, iters: int = 6,
                     min_support: float = 0.22, rel_support: float = 0.5,
                     edge_eps: float = 1e-4, target=None):
    """4D-affinity entry point; see refine_selection_2d."""
    return refine_selection_2d(prepare_matrix(M4), sel, iters, min_support,
                               rel_support, edge_eps, target)


def refine_selection_2d(M: jax.Array, sel: jax.Array, iters: int = 6,
                        min_support: float = 0.22, rel_support: float = 0.5,
                        edge_eps: float = 1e-4, target=None):
    """Iteratively trim a rounded selection to a consistent clique.

    Two rules per iteration:

    1. Support floor: per selected association, support = mean affinity
       to the other selected associations. Nodes falling below
       max(rel * mean-support, min_support) are dropped. min_support is
       absolute and meaningful because the invariant's pairwise scores
       live in [0, 1] with the epsilon gate at exp(-0.5 (eps/sigma)^2).
       This guards the relative rounding threshold against diffuse
       eigenvectors on match-free pairs (which otherwise round to large
       spurious sets).

    2. Clique enforcement: a selected association with a ZERO edge
       (affinity <= edge_eps) to another selected association is not in
       the clique — the epsilon gate zeroed their pairwise consistency.
       The lowest-support such violator is dropped (one per iteration;
       dropping all violators at once could remove both endpoints of a
       single bad edge). Genuine cliques have all-positive edges, so
       recall is unaffected; without this rule the relative rounding
       threshold can admit a 4th near-threshold association that pushes
       a wrong pair over the reference's >=4-association LC acceptance
       (results.py:159), costing precision vs the serial top-omega
       referee (the round-2 0.984-vs-1.000 bench gap).

    `target` (optional, (...,) float — solve_and_round passes the
    UNPENALIZED omega = u'Mu) caps rule 2: zero-edge drops happen only
    while the selection is LARGER than round(target). omega is the
    solver's own density-calibrated clique-size estimate (the quantity
    the reference's omega rounding thresholds on): with unit diagonal
    and mean positive edge weight w over a genuine set of size k at
    density rho, omega ~ 1 + (k-1) rho w. Under heavy odometry drift a
    genuine match is a SPARSE-but-strong subgraph (epsilon gates most of
    its edges), not a clique — trimming it to an actual clique (the
    pre-target behavior) collapsed counts to ~3 and cost all recall at
    1 m drift, while the serial referee's omega rounding kept the
    4-subgraph and its Arun transform was fine. Wrong pairs localize the
    eigenvector on a dense small clique (omega ~ 3) so the cap still
    lets rule 2 trim their spurious 4th association below the LC gate.
    The penalized F = u'(M - d Cb)u sits a hair below omega at
    convergence and rounds 3.5-ish genuine subgraphs down to 3 — use
    omega here. target=None keeps full trimming.
    """
    batch = sel.shape[:-2]
    n, m = sel.shape[-2], sel.shape[-1]
    N = n * m
    eye = jnp.eye(N, dtype=bool)
    idxs = jnp.arange(N)
    if target is None:
        tgt = jnp.zeros(batch + (1,), jnp.float32)  # always allow drops
    else:
        tgt = jnp.maximum(jnp.round(target), 0.0)[..., None]

    # clique-enforcement zero-edge matrix: depends only on M, so it is
    # materialized ONCE (bf16, behind a barrier like M itself — XLA
    # otherwise recomputes the comparison inside every scan step) and
    # each iteration counts zero edges with a matvec. 0/1 bf16 products
    # with f32 accumulation are exact integer counts.
    # HBM NOTE: Z is a second full (..., N, N) bf16 matrix pinned for the
    # refine phase, doubling the XLA engine's per-chunk footprint (e.g.
    # +164 MB at chunk 32, capacity 40 -> N=1600). Deliberate speed/
    # memory trade mirroring the fused kernel's resident layout; size
    # chunk_size * N^2 * 2 * 2 bytes against HBM when raising capacity or
    # PairGridRegistrar chunk_size together (v5e: 16 GB).
    Z = jnp.where((M.astype(jnp.float32) <= edge_eps) & ~eye, 1.0, 0.0)
    Z = jax.lax.optimization_barrier(Z.astype(jnp.bfloat16))

    def body(v, _):
        k = jnp.sum(v, axis=-1, keepdims=True)
        mv = jnp.matmul(M, v[..., None].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)[..., 0]
        supp = mv / jnp.maximum(k - 1.0, 1.0)
        mean_supp = jnp.sum(supp * v, axis=-1, keepdims=True) / jnp.maximum(k, 1.0)
        keep = supp >= jnp.maximum(rel_support * mean_supp, min_support)
        # clique enforcement: count zero edges to other selected nodes
        selected = v > 0.5
        zc = jnp.matmul(Z, v[..., None].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)[..., 0]
        viol = selected & (zc > 0.5)
        any_viol = jnp.any(viol, axis=-1, keepdims=True) & (k > tgt)
        score = jnp.where(viol, supp, 1e30)  # matches fused _BIG_SCORE
        worst = jnp.min(jnp.where(score <= jnp.min(score, axis=-1,
                                                   keepdims=True),
                                  idxs, N), axis=-1, keepdims=True)
        drop = (idxs == worst) & any_viol
        return v * keep * (1.0 - drop.astype(v.dtype)), None

    v0 = sel.reshape(batch + (N,)).astype(jnp.float32)
    v, _ = jax.lax.scan(body, v0, None, length=iters)
    out = (v > 0.5).reshape(sel.shape)
    return out, jnp.sum(out, axis=(-2, -1)).astype(jnp.int32)


def solve_and_round(M4, valid, max_clique: int,
                    params: ClipperSolveParams = ClipperSolveParams(),
                    use_pallas: bool = False):
    """solve() + round_greedy() + refine_selection(); the
    get_selected_associations equivalent (object_registration.py:27-29).
    The bf16 affinity is materialized once and shared by the solve and the
    refinement pass."""
    n, m = M4.shape[-4], M4.shape[-3]
    M = prepare_matrix(M4)
    if use_pallas:
        from roman_tpu.align import clipper_pallas

        u, d, F = clipper_pallas.solve_2d(M, n, m, valid, params)
    else:
        u, d, F = solve_2d(M, n, m, valid, params)
    # clique-size estimate omega = u'Mu on the UNPENALIZED affinity (the
    # quantity the reference's omega rounding thresholds on). The
    # penalized objective F = u'(M - d Cb)u sits a hair below it at
    # convergence, and that hair matters: near-4 genuine subgraphs under
    # heavy drift round(F) to 3 and get trimmed below the LC gate while
    # the serial referee's round(u'Mu) keeps 4 (adversarial drift_1.0m
    # recall 0.375 vs 0.5 before this).
    batch = u.shape[:-2]
    N = n * m
    uf = u.reshape(batch + (N, 1)).astype(jnp.bfloat16)
    Mu = jnp.matmul(M, uf, preferred_element_type=jnp.float32)
    omega = jnp.sum(u.reshape(batch + (N,)) * Mu[..., 0], axis=-1)
    # asymmetric use of the two size estimates: the ROUNDING cap keeps the
    # penalized F (uncapped when F <= 0) — omega >= 1 always (unit
    # diagonal), so an omega cap would strangle weak-but-real pairs that
    # the relative threshold + refinement handle fine — while the REFINE
    # target uses omega so zero-edge trimming never cuts a sparse genuine
    # subgraph below the solver's own unpenalized size estimate.
    sel, count = round_greedy(u, F, max_clique)
    sel, count = refine_selection_2d(M, sel, target=omega)
    return sel, count, u, F
