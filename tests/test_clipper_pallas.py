"""Pallas solve kernel vs the XLA solve (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from roman_tpu.align import clipper, clipper_pallas, invariants, registration
from roman_tpu.sim import world


def _problem(seed, cap=16):
    rng = np.random.default_rng(seed)
    p = world.make_pair_problem(rng, n_common=8, n_only1=4, n_only2=4,
                                center_noise=0.05, desc_dim=16)
    pads = world.pad_problem(p, cap)
    cfg = registration.RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    f1 = registration.build_features(
        jnp.asarray(pads["centers1"]), jnp.asarray(pads["valid1"]), cfg,
        pca_attrs=jnp.asarray(pads["pca1"]), volume=jnp.asarray(pads["volume1"]),
        extent=jnp.asarray(pads["extent1"]), descriptors=jnp.asarray(pads["desc1"]))
    f2 = registration.build_features(
        jnp.asarray(pads["centers2"]), jnp.asarray(pads["valid2"]), cfg,
        pca_attrs=jnp.asarray(pads["pca2"]), volume=jnp.asarray(pads["volume2"]),
        extent=jnp.asarray(pads["extent2"]), descriptors=jnp.asarray(pads["desc2"]))
    M4, _ = invariants.affinity(f1, f2, cfg.invariant_params(4))
    valid = f1.valid[:, None] & f2.valid[None, :]
    return p, M4, valid


def test_pallas_solve_matches_xla():
    p, M4, valid = _problem(3)
    M4b = M4[None]
    validb = valid[None]
    u_x, d_x, F_x = clipper.solve(M4b, validb)
    u_p, d_p, F_p = clipper_pallas.solve(M4b, validb, interpret=True)
    # same clique after rounding
    sel_x, cnt_x = clipper.round_greedy(u_x, F_x, 16)
    sel_p, cnt_p = clipper.round_greedy(u_p, F_p, 16)
    np.testing.assert_array_equal(np.asarray(sel_x), np.asarray(sel_p))
    # eigenvector agreement (up to bf16 noise)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=5e-2)


def test_refine_selection_kills_spurious():
    p, M4, valid = _problem(5)
    u, d, F = clipper.solve(M4[None], valid[None])
    sel, count = clipper.round_greedy(u, F, 16)
    sel_r, count_r = clipper.refine_selection(M4[None], sel)
    # real problem: refinement keeps the clique
    assert int(count_r[0]) >= min(int(count[0]), 5)

    # match-free problem (full roman invariant — distance-only can always
    # find chance cliques in random geometry, which is exactly why the
    # reference fuses semantics + shape): trimmed to below the LC threshold
    rng = np.random.default_rng(9)
    pr = world.make_pair_problem(rng, n_common=0, n_only1=12, n_only2=12,
                                 desc_dim=16)
    pads = world.pad_problem(pr, 16)
    cfg = registration.RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    f1 = registration.build_features(
        jnp.asarray(pads["centers1"]), jnp.asarray(pads["valid1"]), cfg,
        pca_attrs=jnp.asarray(pads["pca1"]), volume=jnp.asarray(pads["volume1"]),
        extent=jnp.asarray(pads["extent1"]), descriptors=jnp.asarray(pads["desc1"]))
    f2 = registration.build_features(
        jnp.asarray(pads["centers2"]), jnp.asarray(pads["valid2"]), cfg,
        pca_attrs=jnp.asarray(pads["pca2"]), volume=jnp.asarray(pads["volume2"]),
        extent=jnp.asarray(pads["extent2"]), descriptors=jnp.asarray(pads["desc2"]))
    M4r, _ = invariants.affinity(f1, f2, cfg.invariant_params(4))
    vr = f1.valid[:, None] & f2.valid[None, :]
    u, d, F = clipper.solve(M4r[None], vr[None])
    sel, count = clipper.round_greedy(u, F, 16)
    sel_r, count_r = clipper.refine_selection(M4r[None], sel)
    assert int(count_r[0]) <= 4
