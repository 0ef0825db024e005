"""Multi-restart homotopy (ClipperSolveParams.n_restarts) across the
three solver implementations: XLA (clipper.solve_2d), standalone pallas
(clipper_pallas, interpret mode) and the fused register kernel
(fused_register, interpret mode).

Semantics under test: R perturbed copies of the warmed start run through
the same penalty homotopy; the feasible solution with the largest
unpenalized omega = u'Mu wins, with restart 0 (the unperturbed
trajectory) preferred on ties. Restarts can therefore never do worse
than the single-start solve on the omega scale, and on easy instances
(where restart 0 converges to the dominant clique) the result is
identical to R=1."""

import numpy as np
import jax.numpy as jnp
import pytest

from roman_tpu.align import clipper, invariants, registration
from roman_tpu.align.clipper import ClipperSolveParams, restart_noise
from roman_tpu.align.registration import RegistrationConfig, register_clipper
from roman_tpu.sim import world
from tests.test_clipper import features_from_problem


def _problem(rng, cap=12, center_noise=0.05, n_common=6):
    p = world.make_pair_problem(rng, n_common=n_common, n_only1=4, n_only2=4,
                                center_noise=center_noise, desc_dim=16)
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    f1, f2 = features_from_problem(world.pad_problem(p, cap), cfg)
    return f1, f2, cfg


def _solve_inputs(f1, f2, cfg):
    M4, _ = invariants.affinity(f1, f2, cfg.invariant_params(
        f1.ratio_feats.shape[-1]))
    valid = f1.valid[..., :, None] & f2.valid[..., None, :]
    return clipper.prepare_matrix(M4), valid


def test_restart_noise_deterministic():
    z1 = restart_noise(8, 64)
    z2 = restart_noise(8, 64)
    assert np.array_equal(z1, z2)
    assert (z1[0] == 0.0).all()
    assert (z1[1:] > 0.0).any() and (z1 >= 0.0).all() and (z1 < 1.0).all()


def test_solve2d_restart0_parity(rng):
    """Easy instance: every restart converges to the dominant clique, the
    tie-break picks restart 0, and the R>1 result equals R=1 exactly."""
    f1, f2, cfg = _problem(rng)
    M, valid = _solve_inputs(f1, f2, cfg)
    u1, d1, F1 = clipper.solve_2d(M, 12, 12, valid, ClipperSolveParams())
    u8, d8, F8 = clipper.solve_2d(M, 12, 12, valid,
                                  ClipperSolveParams(n_restarts=8))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u8))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d8))
    np.testing.assert_array_equal(np.asarray(F1), np.asarray(F8))


def test_solve2d_restart_never_worse(rng):
    """Across a batch of noisy instances the chosen restart's unpenalized
    omega is >= the single-start omega (restart 0 is always in the pool),
    and whenever the single start is feasible the winner is feasible."""
    probs = [world.make_pair_problem(rng, n_common=5, n_only1=6, n_only2=6,
                                     center_noise=0.3, desc_dim=16)
             for _ in range(6)]
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    pads = [world.pad_problem(p, 12) for p in probs]
    s = {k: jnp.asarray(np.stack([d[k] for d in pads])) for k in pads[0]}
    f1 = registration.build_features(
        s["centers1"], s["valid1"], cfg, pca_attrs=s["pca1"],
        volume=s["volume1"], extent=s["extent1"], descriptors=s["desc1"])
    f2 = registration.build_features(
        s["centers2"], s["valid2"], cfg, pca_attrs=s["pca2"],
        volume=s["volume2"], extent=s["extent2"], descriptors=s["desc2"])
    M, valid = _solve_inputs(f1, f2, cfg)

    def omega_of(u):
        N = 12 * 12
        uf = u.reshape(u.shape[:-2] + (N,))
        Mu = jnp.einsum("...ij,...j->...i", M.astype(jnp.float32), uf)
        return np.asarray(jnp.sum(uf * Mu, axis=-1))

    u1, _, _ = clipper.solve_2d(M, 12, 12, valid, ClipperSolveParams())
    u8, _, _ = clipper.solve_2d(M, 12, 12, valid,
                                ClipperSolveParams(n_restarts=8))
    om1, om8 = omega_of(u1), omega_of(u8)
    assert (om8 >= om1 - 1e-3).all(), (om1, om8)
    conv1 = np.asarray(registration._homotopy_converged(
        u1, ClipperSolveParams()))
    conv8 = np.asarray(registration._homotopy_converged(
        u8, ClipperSolveParams()))
    assert (conv8 | ~conv1).all()  # feasible single start => feasible winner


@pytest.mark.parametrize("n_restarts", [4])
def test_pallas_solver_restarts_match_xla(rng, n_restarts):
    """Standalone pallas solve kernel (interpret) vs XLA, R > 1."""
    from roman_tpu.align import clipper_pallas

    f1, f2, cfg = _problem(rng, center_noise=0.25)
    M, valid = _solve_inputs(f1, f2, cfg)
    Mb = M[None]
    validb = valid[None]
    params = ClipperSolveParams(n_restarts=n_restarts)
    ux, dx, Fx = clipper.solve_2d(Mb, 12, 12, validb, params)
    up, dp, Fp = clipper_pallas.solve_2d(Mb, 12, 12, validb, params,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(ux), np.asarray(up), atol=2e-3)
    np.testing.assert_allclose(np.asarray(Fx), np.asarray(Fp), atol=2e-2)


@pytest.mark.parametrize("pairs_per_step", [1, 2])
def test_fused_restarts_match_xla(rng, pairs_per_step):
    """Fused kernel (interpret) vs the XLA engine with n_restarts=4: the
    full register pipeline (build + solve + round + refine) must agree on
    the selected associations."""
    f1, f2, _ = _problem(rng, center_noise=0.2)
    f1b = jnp.broadcast_to
    solver = ClipperSolveParams(n_restarts=4)
    kw = dict(method="roman", cos_min=0.5, cos_max=0.9, solver=solver)
    # batch of 3 so K=2 exercises padding of the last grid step
    import jax

    f1 = jax.tree.map(lambda x: jnp.stack([x, x, x]), f1)
    f2 = jax.tree.map(lambda x: jnp.stack([x, x, x]), f2)
    rx = register_clipper(f1, f2, RegistrationConfig(**kw))
    rp = register_clipper(
        f1, f2,
        RegistrationConfig(**kw, use_pallas=True, pallas_interpret=True,
                           pallas_pairs_per_step=pairs_per_step))
    assert np.array_equal(np.asarray(rx.sel), np.asarray(rp.sel))
    assert np.array_equal(np.asarray(rx.count), np.asarray(rp.count))
    np.testing.assert_allclose(np.asarray(rx.u), np.asarray(rp.u), atol=2e-3)


def test_fused_restart0_parity_easy(rng):
    """Easy instance through the fused kernel: R=8 equals R=1 exactly
    (restart-0 tie-break)."""
    f1, f2, _ = _problem(rng)
    kw = dict(method="roman", cos_min=0.5, cos_max=0.9, use_pallas=True,
              pallas_interpret=True)
    r1 = register_clipper(f1, f2, RegistrationConfig(**kw))
    r8 = register_clipper(
        f1, f2,
        RegistrationConfig(**kw, solver=ClipperSolveParams(n_restarts=8)))
    assert np.array_equal(np.asarray(r1.sel), np.asarray(r8.sel))
    assert np.array_equal(np.asarray(r1.count), np.asarray(r8.count))
