"""Fully fused Pallas registration kernel: affinity + CLIPPER solve +
rounding + refinement in one VMEM-resident program.

The XLA path (invariants.affinity -> clipper.solve_and_round) materializes
the (N, N) affinity in HBM and re-reads it ~150x during the power
iterations plus 6x during refinement; the affinity *build* additionally
streams several (P, n, m, n, m) f32 intermediates through HBM. This kernel
instead takes the per-pair object features (centers, shape-ratio features,
descriptors — a few hundred KB) and produces the selected associations
directly: the affinity matrix exists only in VMEM (5.1 MB bf16 at
N=1600), is built once with MXU selector expansions, and every solve /
refine matvec reads it from VMEM. HBM traffic per pair drops from tens of
MB to the feature inputs + (n, m) outputs.

Math parity: bit-level structure of roman_tpu.align.invariants.affinity
(ROMAN invariant of reference roman/align/roman_registration.py:55-96,
geometric-mean fusion) + clipper.solve_2d / round_greedy /
refine_selection_2d. Tested against the XLA path in interpret mode.

Kernel structure per grid step (K pairs at once; K amortizes the
per-iteration loop overhead of the sequential power iterations):

- expansions (n,n)->(N,N) / (m,m)->(N,N) are selector matmuls with the
  same ROW/COL one-hots used for the rank-structured constraint matvec;
- per-association scores are computed in (n, m) space and flattened to
  flat row/column vectors with one small matmul each;
- pairwise fusion happens in log space, so the sqrt(s_i s_j) endpoint
  geometric means are row+column adds instead of (N, N) outer products;
- the projected power iteration, penalty homotopy, greedy rounding and
  support-based refinement all run on the VMEM-resident bf16 matrix.

Mosaic constraints shape the code: no standalone transposes (every
feature block is passed in both layouts and flat row/col forms are built
by swapped broadcasts), no bool matmul operands, and the bf16 affinity is
staged through a VMEM scratch ref to pin a canonical layout.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roman_tpu.align.clipper import ClipperSolveParams
from roman_tpu.align.clipper_pallas import _selectors

_EPS = 1e-9
# non-violator sentinel in the refine drop rule (finite: Mosaic handles
# inf constants inconsistently across lowerings); matches clipper.py
_BIG_SCORE = 1e30


@dataclasses.dataclass(frozen=True)
class FusedInvariantStatics:
    """Static (compile-time) invariant configuration for the kernel."""

    sigma: float = 0.4
    epsilon: float = 0.6
    mindist: float = 0.2
    cos_min: float = 0.85
    cos_max: float = 1.0
    eps_shape: float = 0.0
    gravity: bool = True
    gravity_unc_ang_rad: float = 0.0872665
    use_ratio: bool = True
    use_cosine: bool = True
    # rounding / refinement (clipper.round_greedy / refine_selection_2d)
    rel_thresh: float = 0.35
    refine_iters: int = 6
    min_support: float = 0.22
    rel_support: float = 0.5
    edge_eps: float = 1e-4
    max_clique: int = 64


_SLAB_BUDGET = 26 * 1024 * 1024  # ~6 live f32 (B, N) build slabs


def _build_block_rows(N: int) -> int:
    """Rows per block for the blocked affinity build.

    N <= 1600 (the calibrated capacity-40 flagship) builds the whole
    (N, N) at once — zero change to the tuned path. Larger N builds in
    row blocks so the f32 build intermediates live as (B, N) slabs
    instead of several full (N, N) f32 buffers: that VMEM headroom is
    what lets capacity 48/64 keep the fused kernel (higher K) instead
    of collapsing to the XLA engine. Block edges are exact row splits
    of the same broadcast arithmetic, so the built matrix is bit-equal
    to the unblocked build.

    B = the largest 16-row-aligned divisor of N <= 1024 whose ~6 live
    f32 (B, N) slabs fit _SLAB_BUDGET; if none fits the budget, the
    largest aligned divisor (VMEM pressure then shows up in
    max_pairs_per_step instead)."""
    if N <= 1600:
        return N
    for B in range(1024, 127, -16):
        if N % B == 0 and 24 * B * N <= _SLAB_BUDGET:
            return B
    for B in range(1024, 127, -16):  # no divisor fits the slab budget
        if N % B == 0:
            return B
    return N


def _kernel(c1_ref, c1t_ref, r1_ref, r1t_ref, d1_ref, d1t_ref,
            c2_ref, c2t_ref, r2_ref, r2t_ref, d2_ref, d2t_ref,
            valid_ref, validt_ref, row_ref, rowt_ref, col_ref, colt_ref,
            *rest,
            n: int, m: int, K: int, inv: FusedInvariantStatics,
            params: ClipperSolveParams):
    R = params.n_restarts
    if R > 1:
        (noise_ref, sel_out, count_out, u_out, f_out,
         m_scratch, mask_scratch, flat_scratch) = rest
    else:
        noise_ref = None
        (sel_out, count_out, u_out, f_out,
         m_scratch, mask_scratch, flat_scratch) = rest
    N = n * m
    B = _build_block_rows(N)
    n_blocks = N // B
    ROW = row_ref[...]           # (N, n) one-hot a-index
    ROWT = rowt_ref[...]         # (n, N)
    COL = col_ref[...]           # (N, m) one-hot b-index
    COLT = colt_ref[...]         # (m, N)

    # selector products must be EXACT: a single-pass bf16 MXU matmul
    # rounds the distance values (~0.1 m at map scale vs sigma 0.4) and
    # measurably shrinks the solved cliques on real workloads
    _hi = jax.lax.Precision.HIGHEST

    def flat_col(Qt):  # (m, n) transposed layout -> (N, 1): Q[a_i, b_i]
        t = jnp.dot(COL, Qt.astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=_hi)
        return jnp.sum(ROW * t, axis=1, keepdims=True)

    def flat_row(Q):   # (n, m) -> (1, N): Q[a_i, b_i]
        t = jnp.dot(Q.astype(jnp.float32), COLT,
                    preferred_element_type=jnp.float32, precision=_hi)
        return jnp.sum(ROWT * t, axis=0, keepdims=True)

    def coord_flat(c, ct, SEL, SELT):
        """Per-association endpoint coordinates as flat col/row vectors:
        three (xq_col (N, 1), xq_row (1, N)) pairs with
        xq_col[i] = c[e_i, q] for the association's endpoint e_i. These
        tiny exact matmuls replace the (N, N) selector expansions of the
        intra-map distance matrices: the big geometry tensors then come
        from pure VPU broadcasts of exact coordinates (same f32 values,
        ~6 GFLOP/pair cheaper)."""
        cols = [
            jnp.dot(SEL, c[:, q:q + 1], preferred_element_type=jnp.float32,
                    precision=_hi)
            for q in range(3)
        ]
        rows = [
            jnp.dot(ct[q:q + 1, :], SELT, preferred_element_type=jnp.float32,
                    precision=_hi)
            for q in range(3)
        ]
        return cols, rows

    def pair_geom_flat(cols, rows):
        """Expanded intra-map geometry: D[i, j] = ||c[e_i] - c[e_j]||,
        |dz|, dxy — all (N, N), computed entirely on the VPU."""
        dX = cols[0] - rows[0]
        dY = cols[1] - rows[1]
        dZ = cols[2] - rows[2]
        dxy2 = dX * dX + dY * dY
        return (jnp.sqrt(dxy2 + dZ * dZ + 1e-20), jnp.abs(dZ),
                jnp.sqrt(dxy2 + 1e-20))

    num_comp = 1 + int(inv.use_ratio) + int(inv.use_cosine)
    vrows = []
    for k in range(K):
        # ---- per-association endpoint coordinates as flat vectors ----
        cols1, rows1 = coord_flat(c1_ref[k], c1t_ref[k], ROW, ROWT)
        cols2, rows2 = coord_flat(c2_ref[k], c2t_ref[k], COL, COLT)

        # ---- per-association scores as flat col/row vectors ----------
        # each term contributes its half-log score from both endpoints
        # (endpoint geometric mean = row add + col add in log space);
        # the (N, N) broadcast happens per row block below, so only
        # (N, 1)/(1, N) vectors are live outside the block loop
        terms = []  # (hl_col (N, 1), hl_row (1, N), fc (N, 1), fr (1, N))
        log_single = jnp.zeros((n, m), jnp.float32)
        single_nz = jnp.ones((n, m), bool)

        def add_assoc_term(s_nm, s_mn):
            nonlocal log_single, single_nz
            fc = flat_col(s_mn)
            fr = flat_row(s_nm)
            hl_col = 0.5 * jnp.log(jnp.maximum(fc, 1e-20))
            hl_row = 0.5 * jnp.log(jnp.maximum(fr, 1e-20))
            terms.append((hl_col, hl_row, fc, fr))
            log_single = log_single + jnp.log(jnp.maximum(s_nm, 1e-20))
            single_nz = single_nz & (s_nm > 0)

        if inv.use_ratio:
            r1 = r1_ref[k]           # (n, F)
            r1t = r1t_ref[k]         # (F, n)
            r2 = r2_ref[k]           # (m, F)
            r2t = r2t_ref[k]         # (F, m)
            F = r1.shape[-1]

            def ratio_gm(a_col, b_row, kk, ll):
                # geometric mean over features of min/max ratios, (kk, ll)
                logsum = jnp.zeros((kk, ll), jnp.float32)
                nz = jnp.ones((kk, ll), bool)
                for f in range(F):
                    a = jnp.abs(a_col[:, f:f + 1])
                    b = jnp.abs(b_row[f:f + 1, :])
                    rho = jnp.minimum(a, b) / jnp.maximum(jnp.maximum(a, b), 1e-9)
                    rho = jnp.where(rho >= inv.eps_shape, rho, 0.0)
                    logsum = logsum + jnp.log(jnp.maximum(rho, 1e-20))
                    nz = nz & (rho > 0)
                return jnp.exp(logsum / F) * nz

            sr = ratio_gm(r1, r2t, n, m)
            srT = ratio_gm(r2, r1t, m, n)
            add_assoc_term(sr, srT)
        if inv.use_cosine:
            d1 = d1_ref[k]           # (n, D)
            d1t = d1t_ref[k]         # (D, n)
            d2 = d2_ref[k]           # (m, D)
            d2t = d2t_ref[k]         # (D, m)

            def cos_score(a, bt, kk, ll):
                dot = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                na = jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True))      # (kk,1)
                nb = jnp.sqrt(jnp.sum(bt * bt, axis=0, keepdims=True))    # (1,ll)
                den = na * nb
                cos = jnp.where(den > 1e-9, dot / jnp.maximum(den, 1e-9), 1.0)
                missing = (na < 1e-9) | (nb < 1e-9)
                s = jnp.clip(
                    (cos - inv.cos_min) / max(inv.cos_max - inv.cos_min, 1e-9),
                    0.0, 1.0,
                )
                return jnp.where(missing, 1.0, s)

            sc = cos_score(d1, d2t, n, m)
            scT = cos_score(d2, d1t, m, n)
            add_assoc_term(sc, scT)

        n_single = num_comp - 1
        if n_single > 0:
            single_nm = jnp.exp(log_single / n_single) * single_nz
        else:
            single_nm = jnp.ones((n, m), jnp.float32)
        validf = valid_ref[k]        # (n, m) f32
        single_nm = jnp.where(validf > 0.5, single_nm, 0.0)
        single_row = flat_row(single_nm)                     # (1, N)
        vcol = flat_col(validt_ref[k]) > 0.5                 # (N, 1)
        vrow = flat_row(validf) > 0.5                        # (1, N)

        # ---- blocked (N, N) build from the flat vectors --------------
        # every (N, N) value is a broadcast of the flat vectors, so the
        # matrix is assembled in (B, N) row slabs (B = N for capacity
        # <= 40): pairwise distance consistency, log-space term adds,
        # structure masks, diagonal singles — then cast + store
        def build_rows(r0, cols1_b, cols2_b, vcol_b, hlcols_b, fcs_b):
            """Build one (B, N) slab of rows [r0, r0+B) from the (B, 1)
            row-range slices of the flat column vectors (full-width row
            vectors are closed over)."""
            D1e, dz1e, dxy1e = pair_geom_flat(cols1_b, rows1)
            D2e, dz2e, dxy2e = pair_geom_flat(cols2_b, rows2)
            gate = (D1e > inv.mindist) & (D2e > inv.mindist)
            if inv.gravity:
                slack = np.sin(inv.gravity_unc_ang_rad) * jnp.maximum(D1e, D2e)
                cz = jnp.maximum(jnp.abs(dz1e - dz2e) - slack, 0.0)
                cxy = jnp.abs(dxy1e - dxy2e)
                cdist = jnp.sqrt(cz * cz + cxy * cxy + 1e-20)
            else:
                cdist = jnp.abs(D1e - D2e)
            sd = jnp.exp(-0.5 * (cdist / inv.sigma) ** 2)
            sd = jnp.where((cdist < inv.epsilon) & gate, sd, 0.0)
            logM = jnp.log(jnp.maximum(sd, 1e-20))
            nonzero = sd > 0.0
            for t, (_, hl_row, _, fr) in enumerate(terms):
                logM = logM + hlcols_b[t] + hl_row
                nonzero = nonzero & (fcs_b[t] > 1e-20) & (fr > 1e-20)
            M = jnp.exp(logM / num_comp) * nonzero

            # ---- structure masks (conflict / diagonal / validity) ----
            ia = r0 + jax.lax.broadcasted_iota(jnp.int32, (B, N), 0)
            ja = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
            same_a = (ia // m) == (ja // m)
            same_b = (ia % m) == (ja % m)
            conflict = same_a != same_b
            diag = same_a & same_b
            valid4 = vcol_b & vrow
            M = jnp.where(conflict | diag | ~valid4, 0.0, M)
            M = M + jnp.where(diag & valid4, single_row + 0.0 * M, 0.0)
            return M.astype(jnp.bfloat16)

        if n_blocks == 1:
            # stage through VMEM scratch: forces a canonical bf16 layout
            # for the matvec operand (a live computed cast trips Mosaic
            # relayout)
            m_scratch[k] = build_rows(
                0, cols1, cols2, vcol,
                [t[0] for t in terms], [t[2] for t in terms])
        else:
            # the blocks MUST run under a fori_loop: unrolled, Mosaic
            # overlaps the blocks' live ranges and spills >100 MB of
            # (B, N) f32 slabs to VMEM (measured: 124 MB of register-
            # allocator spill slots at capacity 48, K=4). Mosaic has no
            # VALUE dynamic_slice, so the flat column vectors are packed
            # into the flat_scratch ref and each block reads its row
            # range back with pl.ds (ref loads take dynamic sublane
            # offsets).
            cidx = 0
            for vec in (*cols1, *cols2):
                flat_scratch[:, cidx:cidx + 1] = vec
                cidx += 1
            flat_scratch[:, cidx:cidx + 1] = jnp.where(
                vcol, 1.0, jnp.zeros((N, 1), jnp.float32))
            cidx += 1
            for hl_col, _, fc, _ in terms:
                flat_scratch[:, cidx:cidx + 1] = hl_col
                flat_scratch[:, cidx + 1:cidx + 2] = fc
                cidx += 2

            def build_body(blk, carry):
                r0 = blk * B
                fs = flat_scratch[pl.ds(r0, B), :]
                cols1_b = [fs[:, q:q + 1] for q in range(3)]
                cols2_b = [fs[:, 3 + q:4 + q] for q in range(3)]
                vcol_b = fs[:, 6:7] > 0.5
                hlcols_b = [fs[:, 7 + 2 * t:8 + 2 * t]
                            for t in range(len(terms))]
                fcs_b = [fs[:, 8 + 2 * t:9 + 2 * t]
                         for t in range(len(terms))]
                m_scratch[k, pl.ds(r0, B), :] = build_rows(
                    r0, cols1_b, cols2_b, vcol_b, hlcols_b, fcs_b)
                return carry
            jax.lax.fori_loop(0, n_blocks, build_body, 0)
        vrows.append(vrow.astype(jnp.float32))

    validf = jnp.concatenate(vrows, axis=0)                  # (K, N)

    # ================= CLIPPER solve (clipper.solve_2d semantics) ==========
    def matvec_rp(u, rp):
        # (K*rp, N) f32 -> (K*rp, N): per-pair M_k matvec over the pair's
        # rp restart rows. The MXU streams M_k from VMEM once whether 1 or
        # rp rows ride in the left operand — restarts are near-free.
        outs = [
            jnp.dot(u[k * rp:(k + 1) * rp].astype(jnp.bfloat16), m_scratch[k],
                    preferred_element_type=jnp.float32)
            for k in range(K)
        ]
        return jnp.concatenate(outs, axis=0)

    def matvec(u):  # (K, N) f32 -> (K, N) f32, per-pair M_k matvec
        return matvec_rp(u, 1)

    def cb_matvec(u):  # rank-structured one-to-one constraint matvec;
        # EXACT selector sums — bf16 rounding of u here distorts the
        # penalty homotopy enough to shrink solved cliques ~2.5x
        rs = jnp.dot(u, ROW, preferred_element_type=jnp.float32,
                     precision=_hi)                                # (K, n)
        cs = jnp.dot(u, COL, preferred_element_type=jnp.float32,
                     precision=_hi)                                # (K, m)
        back = (
            jnp.dot(rs, ROWT, preferred_element_type=jnp.float32,
                    precision=_hi)
            + jnp.dot(cs, COLT, preferred_element_type=jnp.float32,
                      precision=_hi)
        )
        return back - 2.0 * u

    def normalize(u):
        nrm = jnp.sqrt(jnp.sum(u * u, axis=-1, keepdims=True))
        return u / jnp.maximum(nrm, _EPS)

    u = normalize(validf + 1e-3)

    def warm_body(_, u):
        return normalize((matvec(u) + u) * validf)

    u = jax.lax.fori_loop(0, params.warmup_iters, warm_body, u)

    # --- multi-restart expansion (clipper.solve_2d R > 1 semantics) ----
    # per pair k, restart r blends the warmed start toward clipper.
    # restart_noise row r: u_r = normalize((u_warm (1-a_r) + umax a_r
    # z_r) valid), a_r = r / R; row 0 keeps u_warm verbatim (row0f mask
    # arithmetic, the Mosaic-safe select form). Restart rows of pair k
    # live at u[k*R:(k+1)*R] so the per-pair matvec stays one dot.
    if R > 1:
        noise = noise_ref[...]                                  # (R, N)
        # int iota + cast: Mosaic rejects tpu.iota with float result type
        a = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(
            jnp.float32) / R
        row0f = jnp.where(a < 0.5 / R, jnp.ones((R, 1), jnp.float32), 0.0)
        urows, vrows_h = [], []
        for k in range(K):
            uk = u[k:k + 1]                                     # (1, N)
            vk = validf[k:k + 1]
            umax = jnp.max(uk, axis=-1, keepdims=True)
            pert = (uk * (1.0 - a) + umax * a * noise) * vk     # (R, N)
            nrm = jnp.sqrt(jnp.sum(pert * pert, axis=-1, keepdims=True))
            pert = pert / jnp.maximum(nrm, _EPS)
            urows.append(uk * row0f + pert * (1.0 - row0f))
            vrows_h.append(vk * jnp.ones((R, 1), jnp.float32))
        u = jnp.concatenate(urows, axis=0)                      # (K*R, N)
        validf_h = jnp.concatenate(vrows_h, axis=0)
        rp = R
    else:
        validf_h = validf
        rp = 1

    def outer_body(_, carry):
        u, d = carry

        def inner_body(_, u):
            g = matvec_rp(u, rp) - d * cb_matvec(u)
            u_new = jnp.maximum(g, 0.0) * validf_h
            nrm = jnp.sqrt(jnp.sum(u_new * u_new, axis=-1, keepdims=True))
            return jnp.where(nrm > _EPS, u_new / jnp.maximum(nrm, _EPS), u)

        u = jax.lax.fori_loop(0, params.inner_iters, inner_body, u)
        Mu = matvec_rp(u, rp)
        Cbu = cb_matvec(u)
        viol = (u > params.active_eps) & (Cbu > params.active_eps)
        num = jnp.sum(jnp.where(viol, Mu, 0.0), axis=-1, keepdims=True)
        den = jnp.sum(jnp.where(viol, Cbu, 0.0), axis=-1, keepdims=True)
        delta = jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)
        d = d + delta + jnp.where(
            jnp.any(viol, axis=-1, keepdims=True), 1e-3, 0.0)
        return u, d

    u, d = jax.lax.fori_loop(
        0, params.outer_iters, outer_body,
        (u, jnp.zeros((K * rp, 1), jnp.float32)))

    Mu_last = matvec_rp(u, rp)
    Cbu_last = cb_matvec(u)
    F_val = jnp.sum(u * (Mu_last - d * Cbu_last), axis=-1,
                    keepdims=True)                       # (K*rp, 1)
    # unpenalized clique-size estimate omega = u'Mu: the REFINE target
    # uses this (never trim a sparse genuine subgraph below the solver's
    # own size estimate), while the ROUNDING cap keeps the penalized F —
    # omega >= 1 always (unit diagonal), so an omega cap would strangle
    # weak-but-real pairs. See solve_and_round / refine_selection_2d.
    omega = jnp.sum(u * Mu_last, axis=-1, keepdims=True)  # (K*rp, 1)

    if R > 1:
        # per pair, keep the restart with the best feasible unpenalized
        # omega; infeasible rows score -BIG so any feasible row beats
        # every infeasible one, first-max tie-break prefers restart 0
        # (identical rule in clipper.solve_2d / clipper_pallas).
        anyviol = jnp.any(
            (u > params.active_eps) & (Cbu_last > params.active_eps),
            axis=-1, keepdims=True)                      # (K*R, 1)
        score = omega - jnp.where(anyviol, _BIG_SCORE, 0.0)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        us, Fs, oms = [], [], []
        for k in range(K):
            sc = score[k * R:(k + 1) * R]                # (R, 1)
            mx = jnp.max(sc, axis=0, keepdims=True)
            first = jnp.min(jnp.where(sc >= mx, iota_r, R), axis=0,
                            keepdims=True)
            oh = jnp.where(iota_r == first,
                           jnp.ones((R, 1), jnp.float32), 0.0)
            us.append(jnp.sum(u[k * R:(k + 1) * R] * oh, axis=0,
                              keepdims=True))
            Fs.append(jnp.sum(F_val[k * R:(k + 1) * R] * oh, axis=0,
                              keepdims=True))
            oms.append(jnp.sum(omega[k * R:(k + 1) * R] * oh, axis=0,
                               keepdims=True))
        u = jnp.concatenate(us, axis=0)                  # (K, N)
        F_val = jnp.concatenate(Fs, axis=0)              # (K, 1)
        omega = jnp.concatenate(oms, axis=0)             # (K, 1)

    # ================= greedy rounding (clipper.round_greedy) ==============
    max_steps = min(inv.max_clique, min(n, m))
    u_max = jnp.max(u, axis=-1, keepdims=True)
    cut = inv.rel_thresh * u_max
    target = jnp.where(
        F_val > 0,
        jnp.clip(jnp.round(F_val * 2.0), 1, max_steps),
        float(max_steps),
    )
    idxs = jax.lax.broadcasted_iota(jnp.int32, (K, N), 1)

    def round_body(_, carry):
        row_free, col_free, sel, count = carry
        free = (
            jnp.dot(row_free, ROWT, preferred_element_type=jnp.float32)
            * jnp.dot(col_free, COLT, preferred_element_type=jnp.float32)
        )
        cand = jnp.where(free > 0.5, u, -1.0)
        val = jnp.max(cand, axis=-1, keepdims=True)              # (K, 1)
        first = jnp.min(jnp.where(cand >= val, idxs, N), axis=-1,
                        keepdims=True)                           # (K, 1)
        onehot = (idxs == first).astype(jnp.float32)             # (K, N)
        take = ((val > cut) & (val > 0.0)
                & (count < target)).astype(jnp.float32)          # (K, 1)
        sel = sel + onehot * take
        oh_n = jnp.dot(onehot, ROW, preferred_element_type=jnp.float32)
        oh_m = jnp.dot(onehot, COL, preferred_element_type=jnp.float32)
        row_free = row_free * (1.0 - oh_n * take)
        col_free = col_free * (1.0 - oh_m * take)
        count = count + take
        return row_free, col_free, sel, count

    init = (jnp.ones((K, n), jnp.float32), jnp.ones((K, m), jnp.float32),
            jnp.zeros((K, N), jnp.float32), jnp.zeros((K, 1), jnp.float32))
    _, _, sel, _ = jax.lax.fori_loop(0, max_steps, round_body, init)

    # ============ support refinement (clipper.refine_selection_2d) =========
    # clique enforcement (refine_selection_2d rule 2) counts zero edges
    # to other selected nodes via a masked matvec — the 0/1 zero-edge
    # mask depends ONLY on M, so it is built ONCE per pair and the
    # refine iterations reuse it (rebuilding it per iteration measurably
    # dominated the refine phase: 6 extra (N, N) mask builds per pair).
    # The 0/1 mask is a computed bf16 matrix, staged through VMEM
    # scratch before the MXU reads it (M is symmetric, so v @ mask gives
    # the per-node count directly). The diagonal iotas are built in the
    # same straight-line region as the mask (an i1 (N, N) vector carried
    # across a fori_loop region boundary trips a Mosaic "invalid
    # relayout" on real hardware).
    def zc_mask_block(r0, m_blk):
        iaB = r0 + jax.lax.broadcasted_iota(jnp.int32, (B, N), 0)
        jaB = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        # single select whose on-false branch is a full (B, N)
        # vector: Mosaic rejects a big-shape select with two scalar
        # branches ("invalid relayout" of the i1 predicate on real
        # hardware), and likewise an i1-from-VMEM-data ANDed with
        # an i1-from-iota; this form (predicate from data, one
        # vector operand from iota) is the same shape as the build
        # phase's working masks
        nondiag_f = jnp.where(
            iaB == jaB, 0.0, jnp.ones((B, N), jnp.float32))
        return jnp.where(m_blk.astype(jnp.float32)
                         > inv.edge_eps, 0.0, nondiag_f)

    def refine_pair(k, vk):
        """refine_iters trims of pair k's selection vk (1, N); the
        pair's zero-edge mask is live in mask_scratch."""
        idxs1 = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        tgt = jnp.maximum(jnp.round(omega[k:k + 1]), 0.0)      # (1, 1)

        def body(_, v):
            kk = jnp.sum(v, axis=-1, keepdims=True)
            mv = jnp.dot(v.astype(jnp.bfloat16), m_scratch[k],
                         preferred_element_type=jnp.float32)
            supp = mv / jnp.maximum(kk - 1.0, 1.0)
            mean_supp = jnp.sum(supp * v, axis=-1, keepdims=True) \
                / jnp.maximum(kk, 1.0)
            keep = supp >= jnp.maximum(inv.rel_support * mean_supp,
                                       inv.min_support)
            zc = jnp.dot(v.astype(jnp.bfloat16), mask_scratch[...],
                         preferred_element_type=jnp.float32)
            viol = (v > 0.5) & (zc > 0.5)
            # target cap (refine_selection_2d): zero-edge drops only
            # while the selection is larger than round(omega) — the
            # solver's own clique-size estimate. Sparse-but-strong
            # genuine subgraphs under heavy drift stop trimming at
            # their true size; wrong pairs (omega ~ 3) still trim
            # below the >=4 LC gate.
            any_viol = jnp.any(viol, axis=-1, keepdims=True) & (kk > tgt)
            score = jnp.where(viol, supp, _BIG_SCORE)
            mn = jnp.min(score, axis=-1, keepdims=True)
            worst = jnp.min(jnp.where(score <= mn, idxs1, N), axis=-1,
                            keepdims=True)
            drop = ((idxs1 == worst) & any_viol).astype(jnp.float32)
            return v * keep * (1.0 - drop)

        return jax.lax.fori_loop(0, inv.refine_iters, body, vk)

    sels = []
    for k in range(K):
        if n_blocks == 1:
            mask_scratch[...] = zc_mask_block(0, m_scratch[k]).astype(
                jnp.bfloat16)
            sels.append(refine_pair(k, sel[k:k + 1]))
        else:
            # blocked case: mask_scratch only holds one (B, N) slab, so
            # the zc matvec rebuilds mask blocks per iteration under a
            # fori_loop (Mosaic must not overlap the blocks' (B, N) f32
            # intermediates — spill blowup). zc accumulates per-block
            # (1, B) x (B, N) partial counts — sums of 0/1 edge
            # indicators, so the contraction split is exact.
            idxs1 = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
            tgt = jnp.maximum(jnp.round(omega[k:k + 1]), 0.0)

            def blocked_body(_, v, k=k, idxs1=idxs1, tgt=tgt):
                kk = jnp.sum(v, axis=-1, keepdims=True)
                mv = jnp.dot(v.astype(jnp.bfloat16), m_scratch[k],
                             preferred_element_type=jnp.float32)
                supp = mv / jnp.maximum(kk - 1.0, 1.0)
                mean_supp = jnp.sum(supp * v, axis=-1, keepdims=True) \
                    / jnp.maximum(kk, 1.0)
                keep = supp >= jnp.maximum(inv.rel_support * mean_supp,
                                           inv.min_support)

                def zc_body(blk, acc, k=k):
                    r0 = blk * B
                    m_blk = m_scratch[k, pl.ds(r0, B), :]
                    # v's (1, B) block via an exact 0/1 selector dot —
                    # Mosaic has no VALUE dynamic_slice; the selector
                    # is built from iotas (one vector branch in the
                    # select, the Mosaic-safe form used throughout)
                    iN = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)
                    jB = jax.lax.broadcasted_iota(jnp.int32, (N, B), 1)
                    S = jnp.where(iN == r0 + jB,
                                  jnp.ones((N, B), jnp.float32), 0.0)
                    v_blk = jnp.dot(v, S,
                                    preferred_element_type=jnp.float32,
                                    precision=_hi)
                    mask_scratch[...] = zc_mask_block(r0, m_blk).astype(
                        jnp.bfloat16)
                    return acc + jnp.dot(
                        v_blk.astype(jnp.bfloat16), mask_scratch[...],
                        preferred_element_type=jnp.float32)

                zc = jax.lax.fori_loop(0, n_blocks, zc_body,
                                       jnp.zeros((1, N), jnp.float32))
                viol = (v > 0.5) & (zc > 0.5)
                any_viol = jnp.any(viol, axis=-1, keepdims=True) & (kk > tgt)
                score = jnp.where(viol, supp, _BIG_SCORE)
                mn = jnp.min(score, axis=-1, keepdims=True)
                worst = jnp.min(jnp.where(score <= mn, idxs1, N), axis=-1,
                                keepdims=True)
                drop = ((idxs1 == worst) & any_viol).astype(jnp.float32)
                return v * keep * (1.0 - drop)

            sels.append(jax.lax.fori_loop(0, inv.refine_iters, blocked_body,
                                          sel[k:k + 1]))
    sel = jnp.concatenate(sels, axis=0)
    count = jnp.sum((sel > 0.5).astype(jnp.float32), axis=-1, keepdims=True)

    sel_out[0] = sel
    count_out[0] = count
    u_out[0] = u
    f_out[0] = F_val


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "inv", "params", "pairs_per_step", "interpret"),
)
def _fused_flat(c1, r1, d1, c2, r2, d2, valid, n: int, m: int,
                inv: FusedInvariantStatics, params: ClipperSolveParams,
                pairs_per_step: int, interpret: bool):
    P = c1.shape[0]
    K = pairs_per_step
    N = n * m
    ROW, COL = _selectors(n, m)
    n_steps = (P + K - 1) // K
    P_pad = n_steps * K

    def pad(x):
        if x.shape[0] == P_pad:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((P_pad - P,) + x.shape[1:], x.dtype)], axis=0)

    c1, r1, d1 = pad(c1), pad(r1), pad(d1)
    c2, r2, d2 = pad(c2), pad(r2), pad(d2)
    valid = pad(valid.astype(jnp.float32))
    # Mosaic can't legalize standalone transposes, so every block whose
    # transposed layout the kernel needs is shipped in both layouts
    # (features are tiny; the duplication is noise next to the matrix).
    tr = lambda x: jnp.swapaxes(x, -1, -2)
    inputs = (c1, tr(c1), r1, tr(r1), d1, tr(d1),
              c2, tr(c2), r2, tr(r2), d2, tr(d2),
              valid, tr(valid))

    def spec3(x):
        return pl.BlockSpec((K,) + x.shape[1:], lambda i: (i, 0, 0))

    in_specs = [spec3(x) for x in inputs] + [
        pl.BlockSpec((N, n), lambda i: (0, 0)),
        pl.BlockSpec((n, N), lambda i: (0, 0)),
        pl.BlockSpec((N, m), lambda i: (0, 0)),
        pl.BlockSpec((m, N), lambda i: (0, 0)),
    ]
    extra_inputs = []
    if params.n_restarts > 1:
        from roman_tpu.align.clipper import restart_noise

        extra_inputs.append(jnp.asarray(restart_noise(params.n_restarts, N)))
        in_specs.append(
            pl.BlockSpec((params.n_restarts, N), lambda i: (0, 0)))
    # outputs are (n_steps, K, ...) so each block spans the full
    # trailing dims (TPU blocks must tile the last two dims exactly)
    out_specs = [
        pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, K, 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, K, 1), lambda i: (i, 0, 0)),
    ]
    sel, count, u, F = pl.pallas_call(
        functools.partial(_kernel, n=n, m=m, K=K, inv=inv, params=params),
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, K, N), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, K, N), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, K, 1), jnp.float32),
        ],
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((K, N, N), jnp.bfloat16),
                        pltpu.VMEM((_build_block_rows(N), N), jnp.bfloat16),
                        # flat-vector pack for the blocked build (ref-
                        # based dynamic row addressing); unused when
                        # n_blocks == 1
                        pltpu.VMEM((N, 128), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*inputs, jnp.asarray(ROW), jnp.asarray(ROW.T.copy()),
      jnp.asarray(COL), jnp.asarray(COL.T.copy()), *extra_inputs)
    return (sel.reshape(P_pad, N)[:P], count.reshape(P_pad, 1)[:P],
            u.reshape(P_pad, N)[:P], F.reshape(P_pad, 1)[:P])


def max_pairs_per_step(N: int, vmem_budget: int = 110 * 1024 * 1024) -> int:
    """Largest kernel K that fits VMEM at association-matrix size N=n*m.

    Footprint model for the blocked build (B = _build_block_rows(N)):
    K bf16 (N, N) pair matrices + one bf16 (B, N) zero-edge mask
    scratch + ~6 live f32 (B, N) build slabs + the 4 f32 flat-index
    selector matrices (~N*sqrt(N) each) + fixed slush for flat vectors
    and pipeline buffers. Calibrated on v5e (128 MB VMEM, 110 MB
    compiler budget): at N=1600 (capacity 40, B=N full build) the old
    calibrated model is kept unchanged; the blocked build (which also
    charges one (N, N) bf16 solve-phase matvec value copy per pair)
    keeps K=3 at N=2304 (capacity 48) and K=1 at N=4096 (capacity 64)
    where the unblocked build fell to K=1 / XLA fallback. Measured
    on-chip artifacts for those configurations are committed under
    docs/bench/ (round 5: cap40_r5.log 3706 pairs/s, cap48_r5.log 1378,
    cap64_r5.log — each ~2x its XLA fallback). Returns 0 when even K=1
    overflows — callers should use the XLA engine.
    """
    B = _build_block_rows(N)
    per = 2 * N * N  # one bf16 (N, N)
    nmax = int(np.ceil(np.sqrt(N)))
    if B == N:
        if N > 1600:
            # N > 1600 with no 16-aligned divisor in [128, 1024]
            # (prime-factor-poor N): the full-build model below is known
            # optimistic (it reports K=13 near N=1600 where K=8 measured
            # as a VMEM overflow) and has never been calibrated past
            # 1600 — force the XLA engine rather than trust it
            return 0
        # full build: mask scratch + ~4 f32 build intermediates, and the
        # same 2x-per-pair charge as the blocked branch (matvec value
        # copies). Yields K=6 at N=1600, inside the measured boundary
        # (v5e sweep: K=7 ok, K=8 overflows) where a 1x charge reported
        # an impossible K=13; the default K=4 clamp is unaffected for
        # every N <= 1600.
        overhead = per + 8 * per
        return max((vmem_budget - overhead) // (2 * per), 0)
    overhead = (2 * B * N            # bf16 zero-edge mask scratch
                + 24 * B * N         # ~6 live f32 (B, N) build slabs
                + 16 * N * nmax      # 4 f32 selector matrices
                + 4 * N * B          # refine-phase (N, B) f32 zc selector
                + 512 * N            # (N, 128) f32 flat_scratch
                + 8 * 1024 * 1024)   # flat vectors + pipeline slush
    # blocked sizes additionally charge one (N, N) bf16 matvec value
    # copy per pair matrix (solve-phase m_scratch[k] loads)
    return max((vmem_budget - overhead) // (2 * per), 0)


def fused_register(f1, f2, inv: FusedInvariantStatics,
                   params: ClipperSolveParams = ClipperSolveParams(),
                   assoc_mask=None, pairs_per_step: int = 2,
                   interpret: bool = False):
    """Register batched SubmapFeatures pairs with the fused kernel.

    f1/f2: SubmapFeatures with leading batch dims. Returns
    (sel (..., n, m) bool, count (...,) int32, u (..., n, m) f32,
    F (...,) f32) — the solve_and_round contract.

    pairs_per_step is clamped to max_pairs_per_step(n*m) so large
    submap capacities degrade to a smaller K (with the blocked build:
    capacity 48 keeps K=3, capacity 64 runs K=1) instead of overflowing
    VMEM; raises ValueError when no K fits (caller falls back to the
    XLA engine).
    """
    n = f1.capacity
    m = f2.capacity
    if not interpret:
        k_fit = max_pairs_per_step(n * m)
        if k_fit < 1:
            raise ValueError(
                f"fused kernel cannot fit N={n * m} in VMEM at any K; "
                f"use the XLA engine")
        pairs_per_step = min(pairs_per_step, k_fit)
    batch = f1.centers.shape[:-2]
    valid = f1.valid[..., :, None] & f2.valid[..., None, :]
    if assoc_mask is not None:
        valid = valid & assoc_mask

    def flat(x, feat_shape):
        return x.reshape((-1,) + feat_shape)

    Fdim = f1.ratio_feats.shape[-1]
    Ddim = f1.descriptors.shape[-1]
    use_ratio = inv.use_ratio and Fdim > 0
    use_cosine = inv.use_cosine and Ddim > 0
    inv = dataclasses.replace(inv, use_ratio=use_ratio, use_cosine=use_cosine)
    # unused feature blocks are replaced by tiny dummies so block shapes
    # stay well-formed (the kernel never reads them)
    r1 = f1.ratio_feats if use_ratio else jnp.zeros(
        f1.centers.shape[:-1] + (1,), jnp.float32)
    r2 = f2.ratio_feats if use_ratio else jnp.zeros(
        f2.centers.shape[:-1] + (1,), jnp.float32)
    d1 = f1.descriptors if use_cosine else jnp.zeros(
        f1.centers.shape[:-1] + (1,), jnp.float32)
    d2 = f2.descriptors if use_cosine else jnp.zeros(
        f2.centers.shape[:-1] + (1,), jnp.float32)

    sel, count, u, F = _fused_flat(
        flat(f1.centers.astype(jnp.float32), (n, 3)),
        flat(r1.astype(jnp.float32), (n, r1.shape[-1])),
        flat(d1.astype(jnp.float32), (n, d1.shape[-1])),
        flat(f2.centers.astype(jnp.float32), (m, 3)),
        flat(r2.astype(jnp.float32), (m, r2.shape[-1])),
        flat(d2.astype(jnp.float32), (m, d2.shape[-1])),
        flat(valid, (n, m)),
        n, m, inv, params, pairs_per_step, interpret,
    )
    return (
        (sel > 0.5).reshape(batch + (n, m)),
        count.reshape(batch).astype(jnp.int32),
        u.reshape(batch + (n, m)),
        F.reshape(batch),
    )
