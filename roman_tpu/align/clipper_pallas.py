"""Pallas TPU kernel for the CLIPPER projected-power-iteration solve.

The XLA path (clipper.solve) streams the (N, N) bf16 affinity from HBM on
every one of the ~150 power iterations — the solve is pure HBM bandwidth.
This kernel instead pins each pair's affinity matrix in VMEM once (5.3 MB
at N=1600 bf16, well under the ~16 MB budget) and runs the whole homotopy
loop on-chip, so HBM sees the matrix exactly once.

Structure per grid step (one submap pair):
- M block (N, N) bf16 auto-staged into VMEM by the BlockSpec pipeline.
- u kept as a (1, N) f32 row; M is symmetric, so M @ u == (u @ M)^T and
  every matvec is a (1, N) x (N, N) MXU product with f32 accumulation.
- The one-to-one constraint matvec Cb u = rowsum + colsum - 2u is computed
  with two constant selector matmuls (ROW: (N, n), COL: (N, m)) instead of
  any N x N constraint matrix (see clipper._cb_matvec for the rank
  structure).

Numerics match clipper.solve (same warmup/homotopy schedule); tests
compare the two paths in interpret mode, and registration can switch per
RegistrationConfig.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roman_tpu.align.clipper import ClipperSolveParams

_EPS = 1e-9


def _selectors(n: int, m: int):
    """ROW (N, n), COL (N, m) one-hot selectors for flat index a*m+b."""
    N = n * m
    a = np.arange(N) // m
    b = np.arange(N) % m
    ROW = np.zeros((N, n), np.float32)
    ROW[np.arange(N), a] = 1.0
    COL = np.zeros((N, m), np.float32)
    COL[np.arange(N), b] = 1.0
    return ROW, COL


def _solve_kernel(M_ref, valid_ref, row_ref, col_ref, *rest,
                  params: ClipperSolveParams):
    R = params.n_restarts
    if R > 1:
        noise_ref, u_out, d_out, F_out = rest
    else:
        noise_ref = None
        u_out, d_out, F_out = rest
    M = M_ref[0]               # (N, N) bf16 in VMEM
    validf = valid_ref[0]      # (1, N) f32
    ROW = row_ref[...]
    COL = col_ref[...]

    def matvec(u_row):
        # (rows, N) x (N, N): the MXU streams M once for 1 or R rows
        return jnp.dot(u_row.astype(jnp.bfloat16), M,
                       preferred_element_type=jnp.float32)

    def cb_matvec(u_row):
        rs = jnp.dot(u_row, ROW, preferred_element_type=jnp.float32)  # (., n)
        cs = jnp.dot(u_row, COL, preferred_element_type=jnp.float32)  # (., m)
        back = (
            jnp.dot(rs, ROW.T, preferred_element_type=jnp.float32)
            + jnp.dot(cs, COL.T, preferred_element_type=jnp.float32)
        )
        return back - 2.0 * u_row

    def normalize(u_row):
        nrm = jnp.sqrt(jnp.sum(u_row * u_row))
        return u_row / jnp.maximum(nrm, _EPS)

    u = normalize(validf + 1e-3)

    def warm_body(_, u):
        return normalize((matvec(u) + u) * validf)

    u = jax.lax.fori_loop(0, params.warmup_iters, warm_body, u)

    if R == 1:
        def outer_body(_, carry):
            u, d = carry

            def inner_body(_, u):
                g = matvec(u) - d * cb_matvec(u)
                u_new = jnp.maximum(g, 0.0) * validf
                nrm = jnp.sqrt(jnp.sum(u_new * u_new))
                return jnp.where(nrm > _EPS, u_new / jnp.maximum(nrm, _EPS), u)

            u = jax.lax.fori_loop(0, params.inner_iters, inner_body, u)
            Mu = matvec(u)
            Cbu = cb_matvec(u)
            viol = (u > params.active_eps) & (Cbu > params.active_eps)
            num = jnp.sum(jnp.where(viol, Mu, 0.0))
            den = jnp.sum(jnp.where(viol, Cbu, 0.0))
            delta = jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)
            d = d + delta + jnp.where(jnp.any(viol), 1e-3, 0.0)
            return u, d

        u, d = jax.lax.fori_loop(0, params.outer_iters, outer_body, (u, 0.0))

        Mdu = matvec(u) - d * cb_matvec(u)
        F = jnp.sum(u * Mdu)
        u_out[0] = u
        d_out[0] = jnp.broadcast_to(d, (1, 1))  # scalar VMEM stores need 2D
        F_out[0] = jnp.broadcast_to(F, (1, 1))
        return

    # ---- multi-restart homotopy (clipper.solve_2d R > 1 semantics) ----
    # expansion: u_r = normalize((u_warm (1 - a_r) + umax a_r z_r) valid)
    # with a_r = r / R and z = clipper.restart_noise; row 0 keeps the
    # warmed start verbatim (row0f mask arithmetic, not a select — the
    # Mosaic-safe pattern).
    N = validf.shape[-1]
    noise = noise_ref[...]                                      # (R, N)
    # int iota + cast: Mosaic rejects tpu.iota with float result type
    a = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(
        jnp.float32) / R
    row0f = jnp.where(a < 0.5 / R, jnp.ones((R, 1), jnp.float32), 0.0)
    umax = jnp.max(u, axis=-1, keepdims=True)                   # (1, 1)
    pert = (u * (1.0 - a) + umax * a * noise) * validf          # (R, N)
    nrm = jnp.sqrt(jnp.sum(pert * pert, axis=-1, keepdims=True))
    pert = pert / jnp.maximum(nrm, _EPS)
    u = u * row0f + pert * (1.0 - row0f)                        # (R, N)

    def normalize_rows(u_new, u_old):
        nrm = jnp.sqrt(jnp.sum(u_new * u_new, axis=-1, keepdims=True))
        return jnp.where(nrm > _EPS, u_new / jnp.maximum(nrm, _EPS), u_old)

    def outer_body(_, carry):
        u, d = carry

        def inner_body(_, u):
            g = matvec(u) - d * cb_matvec(u)
            return normalize_rows(jnp.maximum(g, 0.0) * validf, u)

        u = jax.lax.fori_loop(0, params.inner_iters, inner_body, u)
        Mu = matvec(u)
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
        (u, jnp.zeros((R, 1), jnp.float32)))

    # keep the restart with the best feasible unpenalized omega = u'Mu;
    # infeasible rows score -BIG, first-max tie-break prefers restart 0
    Mu = matvec(u)
    Cbu = cb_matvec(u)
    omega = jnp.sum(u * Mu, axis=-1, keepdims=True)             # (R, 1)
    anyviol = jnp.any((u > params.active_eps) & (Cbu > params.active_eps),
                      axis=-1, keepdims=True)
    F_all = jnp.sum(u * (Mu - d * Cbu), axis=-1, keepdims=True)
    score = omega - jnp.where(anyviol, 1e30, 0.0)
    mx = jnp.max(score, axis=0, keepdims=True)                  # (1, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    first = jnp.min(jnp.where(score >= mx, iota_r, R), axis=0,
                    keepdims=True)
    oh = jnp.where(iota_r == first, jnp.ones((R, 1), jnp.float32), 0.0)
    u_out[0] = jnp.sum(u * oh, axis=0, keepdims=True)
    d_out[0] = jnp.sum(d * oh, axis=0, keepdims=True)
    F_out[0] = jnp.sum(F_all * oh, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n", "m", "params", "interpret"))
def _solve_flat(M, validf, n: int, m: int,
                params: ClipperSolveParams, interpret: bool):
    P, N, _ = M.shape
    ROW, COL = _selectors(n, m)
    in_specs = [
        pl.BlockSpec((1, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    extra_inputs = []
    if params.n_restarts > 1:
        from roman_tpu.align.clipper import restart_noise

        R = params.n_restarts
        extra_inputs.append(jnp.asarray(restart_noise(R, N)))
        in_specs.append(
            pl.BlockSpec((R, N), lambda i: (0, 0), memory_space=pltpu.VMEM))
    grid_spec = pl.GridSpec(
        grid=(P,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    u, d, F = pl.pallas_call(
        functools.partial(_solve_kernel, params=params),
        out_shape=[
            jax.ShapeDtypeStruct((P, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(M, validf.reshape(P, 1, N), jnp.asarray(ROW), jnp.asarray(COL),
      *extra_inputs)
    return u.reshape(P, N), d.reshape(P, 1), F.reshape(P, 1)


def solve(M4: jax.Array, valid: jax.Array,
          params: ClipperSolveParams = ClipperSolveParams(),
          interpret: bool = False):
    """Drop-in replacement for clipper.solve (leading batch dim required)."""
    from roman_tpu.align.clipper import prepare_matrix

    n, m = M4.shape[-4], M4.shape[-3]
    return solve_2d(prepare_matrix(M4), n, m, valid, params, interpret)


def solve_2d(M: jax.Array, n: int, m: int, valid: jax.Array,
             params: ClipperSolveParams = ClipperSolveParams(),
             interpret: bool = False):
    """Prepared-matrix entry (M: (..., N, N) bf16)."""
    batch = M.shape[:-2]
    N = n * m
    Mf = M.reshape((-1, N, N))
    validf = valid.reshape((-1, N)).astype(jnp.float32)
    u, d, F = _solve_flat(Mf, validf, n, m, params, interpret)
    return (u.reshape(batch + (n, m)), d.reshape(batch), F.reshape(batch))
