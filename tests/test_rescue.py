"""Unconverged-solve rescue (registration.register_clipper_rescued,
PairGridRegistrar._apply_rescue).

The fixed (8,6,6) iteration budget can run out mid-homotopy on hard
instances (heavy odometry drift leaves a sparse-but-strong genuine
subgraph): the eigenvector localizes on a single node and a genuine
match is lost (count=1) where the serial reference-budget solver finds
the 4-set (reference acceptance gate: >=4 associations,
roman/align/results.py:156-195). Such pairs are flagged by
RegistrationResult.converged == False (active one-to-one constraint
violations remain at the final u) and re-solved once at RESCUE_SOLVER
budget.

The hard instance below is drift_1.0m pair 17 of the adversarial sweep
(sim seed 0): unconverged at the default budget, count collapses to 1;
the rescue recovers the genuine 4-association set.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from roman_tpu.align import registration
from roman_tpu.align.registration import (
    RESCUE_SOLVER,
    RegistrationConfig,
)
from roman_tpu.sim import world

CAPACITY = 24  # >= 22 objects per view; smaller N than the sweep's 40
                # for test speed — (non-)convergence is a property of the
                # problem+budget, not of the padding


def _drift_pairs(n_pairs=18, center_noise=1.0):
    rng = np.random.default_rng(0)
    problems = [
        world.make_pair_problem(rng, n_common=14, n_only1=8, n_only2=8,
                                desc_dim=128, center_noise=center_noise)
        for _ in range(n_pairs)
    ]
    pads = [world.pad_problem(p, CAPACITY) for p in problems]
    return problems, pads


def _features(pads, cfg):
    def stack(key):
        return jnp.asarray(np.stack([p[key] for p in pads]))

    f1 = registration.build_features(
        stack("centers1"), stack("valid1"), cfg, pca_attrs=stack("pca1"),
        volume=stack("volume1"), extent=stack("extent1"),
        descriptors=stack("desc1"))
    f2 = registration.build_features(
        stack("centers2"), stack("valid2"), cfg, pca_attrs=stack("pca2"),
        volume=stack("volume2"), extent=stack("extent2"),
        descriptors=stack("desc2"))
    return f1, f2


@pytest.fixture(scope="module")
def cfg():
    return RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9,
                              use_pallas=False)


@pytest.fixture(scope="module")
def drift_results(cfg):
    problems, pads = _drift_pairs()
    f1, f2 = _features(pads, cfg)
    base = registration.register_clipper(f1, f2, cfg)
    rescued = registration.register_clipper_rescued(f1, f2, cfg)
    return problems, f1, f2, base, rescued


def test_converged_flag_marks_budget_exhaustion(drift_results):
    _, _, _, base, _ = drift_results
    conv = np.asarray(base.converged)
    assert conv.dtype == bool and conv.shape == (18,)
    # the known-hard instance ran out of budget; most pairs converge
    assert not conv[17]
    assert conv.sum() >= 12


def test_rescue_recovers_genuine_set(drift_results):
    problems, _, _, base, rescued = drift_results
    # unconverged collapse at the default budget...
    assert int(np.asarray(base.count)[17]) < 4
    # ...rescued to >= 4 associations, all of them genuine GT matches
    assert int(np.asarray(rescued.count)[17]) >= 4
    gt = {tuple(x) for x in problems[17].gt_assoc}
    sel = {tuple(x) for x in np.argwhere(np.asarray(rescued.sel)[17])}
    assert sel <= gt


def test_rescue_leaves_converged_pairs_untouched(drift_results):
    _, _, _, base, rescued = drift_results
    conv = np.asarray(base.converged)
    np.testing.assert_array_equal(np.asarray(base.sel)[conv],
                                  np.asarray(rescued.sel)[conv])
    np.testing.assert_array_equal(np.asarray(base.T_align)[conv],
                                  np.asarray(rescued.T_align)[conv])


def test_rescue_noop_on_easy_batch(cfg):
    _, pads = _drift_pairs(n_pairs=4, center_noise=0.1)
    f1, f2 = _features(pads, cfg)
    res = registration.register_clipper_rescued(f1, f2, cfg)
    assert np.asarray(res.converged).all()
    assert (np.asarray(res.count) >= 4).all()


def test_rescue_budget_matches_direct_high_budget_solve(drift_results, cfg):
    import dataclasses

    problems, f1, f2, _, rescued = drift_results
    rcfg = dataclasses.replace(cfg, solver=RESCUE_SOLVER)
    direct = registration.register_clipper(f1, f2, rcfg)
    # the spliced pair equals a straight high-budget solve of that pair
    np.testing.assert_array_equal(np.asarray(rescued.sel)[17],
                                  np.asarray(direct.sel)[17])


def test_registrar_timed_mode_applies_rescue(cfg):
    from roman_tpu.align.submap_align import PairGridRegistrar

    _, pads = _drift_pairs()
    f1, f2 = _features(pads, cfg)
    ids = jnp.zeros((18, CAPACITY), jnp.int32)
    reg = PairGridRegistrar(cfg, chunk_size=6)
    idx = np.arange(18)
    res, times = reg(f1, f2, ids, ids, idx, idx, timed=True)
    assert times.shape == (18,) and (times > 0).all()
    assert int(np.asarray(res.count)[17]) >= 4  # rescued in timed mode too


def test_registrar_no_rescue_for_solvers_without_homotopy(cfg):
    """register_ransac has no homotopy: converged is None and the rescue
    guard must pass the result through untouched."""
    import dataclasses

    from roman_tpu.align.submap_align import PairGridRegistrar

    _, pads = _drift_pairs(n_pairs=3, center_noise=0.1)
    f1, f2 = _features(pads, cfg)
    ids = jnp.zeros((3, CAPACITY), jnp.int32)
    rcfg = dataclasses.replace(cfg, method="ransac", ransac_iter=256)
    reg = PairGridRegistrar(rcfg, chunk_size=3)
    res = reg(f1, f2, ids, ids, np.arange(3), np.arange(3))
    assert res.converged is None
    assert res.count.shape == (3,)


def test_registrar_applies_rescue(cfg):
    from roman_tpu.align.submap_align import PairGridRegistrar

    _, pads = _drift_pairs()

    def stack(key):
        return jnp.asarray(np.stack([p[key] for p in pads]))

    f1, f2 = _features(pads, cfg)
    ids = jnp.zeros((18, CAPACITY), jnp.int32)
    reg = PairGridRegistrar(cfg, chunk_size=6)
    idx = np.arange(18)
    res = reg(f1, f2, ids, ids, idx, idx)
    # the collapsed pair was re-dispatched at RESCUE_SOLVER budget: its
    # spliced result equals a straight high-budget solve (one rescue
    # attempt only — the post-rescue converged flag stays honest and may
    # remain False on instances even the big budget cannot finish)
    assert int(np.asarray(res.count)[17]) >= 4
    rescue_direct = registration.register_clipper_rescued(f1, f2, cfg)
    np.testing.assert_array_equal(np.asarray(res.sel)[17],
                                  np.asarray(rescue_direct.sel)[17])
    np.testing.assert_array_equal(np.asarray(res.count),
                                  np.asarray(rescue_direct.count))


def test_registrar_inprogram_rescue_no_host_redispatch(cfg, monkeypatch):
    """The common case (1-3 unconverged pairs <= RESCUE_CAP) is rescued
    INSIDE the single compiled program — the host-level re-dispatch
    (~1 s tunnel round trip, docs/PERF.md) must not fire at all."""
    from roman_tpu.align.submap_align import PairGridRegistrar

    _, pads = _drift_pairs()
    f1, f2 = _features(pads, cfg)
    ids = jnp.zeros((18, CAPACITY), jnp.int32)
    reg = PairGridRegistrar(cfg, chunk_size=6)
    monkeypatch.setattr(
        PairGridRegistrar, "_rescue_registrar",
        lambda self: (_ for _ in ()).throw(
            AssertionError("host rescue re-dispatch fired")))
    idx = np.arange(18)
    res = reg(f1, f2, ids, ids, idx, idx)
    rescue_direct = registration.register_clipper_rescued(f1, f2, cfg)
    np.testing.assert_array_equal(np.asarray(res.count),
                                  np.asarray(rescue_direct.count))
    np.testing.assert_array_equal(np.asarray(res.sel),
                                  np.asarray(rescue_direct.sel))


def test_registrar_inprogram_rescue_overflow_falls_back(cfg, monkeypatch):
    """More unconverged pairs than RESCUE_CAP slots: the in-program stage
    rescues CAP of them and the host re-dispatch handles ONLY the
    overflow rows (already_rescued mask) — end result identical to
    rescuing everything."""
    from roman_tpu.align import submap_align

    _, pads = _drift_pairs()
    f1, f2 = _features(pads, cfg)
    ids = jnp.zeros((18, CAPACITY), jnp.int32)
    monkeypatch.setattr(submap_align, "RESCUE_CAP", 1)
    reg = submap_align.PairGridRegistrar(cfg, chunk_size=6)
    idx = np.arange(18)
    res = reg(f1, f2, ids, ids, idx, idx)
    rescue_direct = registration.register_clipper_rescued(f1, f2, cfg)
    np.testing.assert_array_equal(np.asarray(res.count),
                                  np.asarray(rescue_direct.count))
    np.testing.assert_array_equal(np.asarray(res.sel),
                                  np.asarray(rescue_direct.sel))


def test_rescue_inherits_restarts(cfg):
    """rescue_solver keeps RESCUE_SOLVER's iteration budget but inherits
    the caller's n_restarts — a fixed single-start rescue would silently
    disable SubmapAlignParams.solver_restarts on exactly the unconverged
    hard pairs the knob targets."""
    import dataclasses as dc

    from roman_tpu.align.clipper import ClipperSolveParams
    from roman_tpu.align.registration import rescue_solver

    for r in (1, 4, 8):
        got = rescue_solver(ClipperSolveParams(n_restarts=r))
        assert got.n_restarts == r
        assert (got.warmup_iters, got.outer_iters, got.inner_iters) == (
            RESCUE_SOLVER.warmup_iters, RESCUE_SOLVER.outer_iters,
            RESCUE_SOLVER.inner_iters)

    # the registrar's rescue config carries the knob through
    from roman_tpu.align.submap_align import PairGridRegistrar

    rcfg = dc.replace(cfg, solver=dc.replace(cfg.solver, n_restarts=4))
    registrar = PairGridRegistrar(rcfg, single_robot_lc=False)
    assert registrar._rescue_registrar().cfg.solver.n_restarts == 4
