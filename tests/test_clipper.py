import numpy as np
import jax
import jax.numpy as jnp

from roman_tpu.align import clipper, invariants, registration
from roman_tpu.align.invariants import ROMANInvariantParams, SubmapFeatures
from roman_tpu.sim import world
from roman_tpu.ops.se3 import rotation_magnitude


def features_from_problem(pads, cfg):
    f1 = registration.build_features(
        jnp.asarray(pads["centers1"]), jnp.asarray(pads["valid1"]), cfg,
        pca_attrs=jnp.asarray(pads["pca1"]), volume=jnp.asarray(pads["volume1"]),
        extent=jnp.asarray(pads["extent1"]), descriptors=jnp.asarray(pads["desc1"]),
    )
    f2 = registration.build_features(
        jnp.asarray(pads["centers2"]), jnp.asarray(pads["valid2"]), cfg,
        pca_attrs=jnp.asarray(pads["pca2"]), volume=jnp.asarray(pads["volume2"]),
        extent=jnp.asarray(pads["extent2"]), descriptors=jnp.asarray(pads["desc2"]),
    )
    return f1, f2


def eval_assoc(sel, gt_assoc, n_valid1, n_valid2):
    sel = np.asarray(sel)
    gt = set(map(tuple, gt_assoc.tolist()))
    got = set(map(tuple, np.argwhere(sel).tolist()))
    tp = len(gt & got)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(gt), 1)
    return precision, recall, got


def test_cb_matvec_matches_dense():
    rng = np.random.default_rng(3)
    n, m = 5, 6
    N = n * m
    U = rng.uniform(size=(n, m))
    # dense Cb: conflict iff shares exactly one endpoint
    Cb = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            a1, b1 = divmod(i, m)
            a2, b2 = divmod(j, m)
            if (a1 == a2) != (b1 == b2):
                Cb[i, j] = 1.0
    ref = (Cb @ U.reshape(-1)).reshape(n, m)
    got = np.asarray(clipper._cb_matvec(jnp.asarray(U)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_planted_clique_recovery():
    """Plant a consistent clique among noise associations; the solver must
    recover exactly the planted set."""
    rng = np.random.default_rng(5)
    p = world.make_pair_problem(rng, n_common=12, n_only1=8, n_only2=8,
                                center_noise=0.05, yaw=2.0)
    cfg = registration.RegistrationConfig(method="clipper")  # distance only
    pads = world.pad_problem(p, 24)
    f1, f2 = features_from_problem(pads, cfg)
    M4, single = invariants.affinity(f1, f2, cfg.invariant_params(0))
    valid = f1.valid[:, None] & f2.valid[None, :]
    sel, count, u, F = clipper.solve_and_round(M4, valid, 24)
    precision, recall, got = eval_assoc(sel, p.gt_assoc, 20, 20)
    assert precision >= 0.9, (precision, recall)
    assert recall >= 0.75, (precision, recall)


def test_roman_invariant_improves_on_distance_only():
    """With semantics+shape, ambiguous geometry resolves correctly."""
    rng = np.random.default_rng(7)
    precisions = {}
    for method in ["clipper", "roman"]:
        rng2 = np.random.default_rng(7)
        p = world.make_pair_problem(rng2, n_common=15, n_only1=15, n_only2=15,
                                    center_noise=0.15, yaw=-1.3, desc_dim=32)
        cfg = registration.RegistrationConfig(method=method, cos_min=0.5, cos_max=0.9)
        pads = world.pad_problem(p, 32)
        f1, f2 = features_from_problem(pads, cfg)
        if method == "roman":
            res = registration.register_clipper(f1, f2, cfg)
        else:
            res = registration.register_clipper(f1, f2, cfg)
        precision, recall, _ = eval_assoc(res.sel, p.gt_assoc, 30, 30)
        precisions[method] = (precision, recall)
    assert precisions["roman"][0] >= precisions["clipper"][0] - 1e-9
    assert precisions["roman"][1] >= 0.6


def test_register_recovers_transform():
    rng = np.random.default_rng(11)
    p = world.make_pair_problem(rng, n_common=20, n_only1=10, n_only2=10,
                                center_noise=0.05, yaw=0.8, desc_dim=32)
    cfg = registration.RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    pads = world.pad_problem(p, 32)
    f1, f2 = features_from_problem(pads, cfg)
    res = registration.register_clipper(f1, f2, cfg)
    assert bool(res.ok)
    T = np.asarray(res.T_align)
    err = np.linalg.inv(T) @ p.T_gt
    ang = float(rotation_magnitude(jnp.asarray(err[:3, :3])))
    assert np.linalg.norm(err[:3, 3]) < 0.5, err
    assert abs(ang) < 0.05


def test_batched_pairs_vmap():
    """The whole point: many pairs registered in one call."""
    rng = np.random.default_rng(13)
    cfg = registration.RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    cap = 24
    probs = [
        world.make_pair_problem(rng, n_common=12, n_only1=6, n_only2=6,
                                center_noise=0.05, desc_dim=16)
        for _ in range(4)
    ]
    pads = [world.pad_problem(p, cap) for p in probs]
    stack = {k: jnp.asarray(np.stack([d[k] for d in pads])) for k in pads[0]}
    f1 = registration.build_features(
        stack["centers1"], stack["valid1"], cfg, pca_attrs=stack["pca1"],
        volume=stack["volume1"], extent=stack["extent1"], descriptors=stack["desc1"])
    f2 = registration.build_features(
        stack["centers2"], stack["valid2"], cfg, pca_attrs=stack["pca2"],
        volume=stack["volume2"], extent=stack["extent2"], descriptors=stack["desc2"])
    res = jax.jit(lambda a, b: registration.register_clipper(a, b, cfg))(f1, f2)
    assert res.sel.shape == (4, cap, cap)
    for k, p in enumerate(probs):
        precision, recall, _ = eval_assoc(np.asarray(res.sel[k]), p.gt_assoc, 18, 18)
        assert precision >= 0.8, (k, precision, recall)
        T = np.asarray(res.T_align[k])
        err = np.linalg.inv(T) @ p.T_gt
        assert np.linalg.norm(err[:3, 3]) < 0.6


def test_no_match_yields_few_associations():
    """Two unrelated maps should produce a small clique (below the >=4 LC
    acceptance threshold most of the time)."""
    rng = np.random.default_rng(17)
    p = world.make_pair_problem(rng, n_common=0, n_only1=20, n_only2=20,
                                center_noise=0.1, desc_dim=32)
    cfg = registration.RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    pads = world.pad_problem(p, 24)
    f1, f2 = features_from_problem(pads, cfg)
    res = registration.register_clipper(f1, f2, cfg)
    assert int(res.count) <= 4


def test_empty_submap():
    cfg = registration.RegistrationConfig(method="clipper")
    cap = 8
    z = jnp.zeros((cap, 3))
    f1 = registration.build_features(z, jnp.zeros(cap, bool), cfg)
    f2 = registration.build_features(z, jnp.ones(cap, bool), cfg)
    res = registration.register_clipper(f1, f2, cfg)
    assert int(res.count) == 0 and not bool(res.ok)


def test_get_mca_and_mno_clipper():
    rng = np.random.default_rng(21)
    p = world.make_pair_problem(rng, n_common=10, n_only1=5, n_only2=5,
                                center_noise=0.05, desc_dim=16)
    cfg = registration.RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    pads = world.pad_problem(p, 20)
    f1, f2 = features_from_problem(pads, cfg)
    M, C, A = registration.get_MCA(f1, f2, cfg)
    N = 20 * 20
    assert M.shape == (N, N) and C.shape == (N, N) and A.shape == (N, 2)
    # constraint: same row different col is a conflict
    assert float(C[0, 1]) == 0.0 and float(C[0, 21]) == 1.0

    sols = registration.mno_clipper(f1, f2, cfg, num_solutions=2)
    (sel1, c1, s1), (sel2, c2, s2) = sols
    assert int(c1) >= int(c2)
    # solutions are non-overlapping
    assert not bool(jnp.any(sel1 & sel2))


def test_clipper_prune_packing_and_solve_flags():
    """Regression: for method clipper+prune, build_features must PACK
    shape attrs + descriptors (the prune gates need them) while the
    invariant solves plain Euclidean distance (no gravity branch, no
    ratio/cosine consistency — reference dist_reg_with_pruning.py:49-57)."""
    import numpy as np

    from roman_tpu.align.registration import (RegistrationConfig,
                                              build_features,
                                              register_clipper_prune)

    cfg = RegistrationConfig(method="clipper+prune", cos_min=0.9,
                             epsilon_shape=0.8)
    assert cfg.solve_flags == (False, False, False)
    p = cfg.invariant_params(4)
    assert not p.gravity and not p.use_ratio and not p.use_cosine

    rng = np.random.default_rng(2)
    centers = rng.uniform(-6, 6, (6, 3)).astype(np.float32)
    pca = np.tile(np.array([0.4, 0.4, 0.2], np.float32), (6, 1))
    vol = np.ones(6, np.float32)
    descs = np.eye(6, 8, dtype=np.float32)
    f1 = build_features(jnp.asarray(centers), jnp.ones(6, bool), cfg,
                        pca_attrs=jnp.asarray(pca), volume=jnp.asarray(vol),
                        descriptors=jnp.asarray(descs))
    # packing now carries pca(3)+volume(1) ratio feats and descriptors
    assert f1.ratio_feats.shape[-1] == 4 and f1.descriptors.shape[-1] == 8

    # map2 = identical cloud, but the semantic identities are permuted
    # for objects 4/5: distance-only CLIPPER still associates them
    # (geometry is identical); the cosine prune must exclude them
    perm = np.array([0, 1, 2, 3, 5, 4])
    f2 = build_features(jnp.asarray(centers), jnp.ones(6, bool), cfg,
                        pca_attrs=jnp.asarray(pca), volume=jnp.asarray(vol),
                        descriptors=jnp.asarray(descs[perm]))
    res_nosem = register_clipper_prune(f1, f2, cfg,
                                       pca_attrs1=jnp.asarray(pca),
                                       volume1=jnp.asarray(vol),
                                       pca_attrs2=jnp.asarray(pca),
                                       volume2=jnp.asarray(vol))
    assert int(res_nosem.count) == 6  # no semantic prune: all match
    res_sem = register_clipper_prune(f1, f2, cfg,
                                     pca_attrs1=jnp.asarray(pca),
                                     volume1=jnp.asarray(vol),
                                     pca_attrs2=jnp.asarray(pca),
                                     volume2=jnp.asarray(vol),
                                     descriptors1=f1.descriptors,
                                     descriptors2=f2.descriptors)
    sel = np.argwhere(np.asarray(res_sem.sel))
    assert int(res_sem.count) == 4
    assert all(i == j and i < 4 for i, j in sel)
