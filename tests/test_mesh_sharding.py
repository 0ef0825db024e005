"""Pair-grid sharding over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from roman_tpu.align.registration import RegistrationConfig
from roman_tpu.align.submap_align import PairGridRegistrar
from roman_tpu.map.roman_map import submaps_to_features, SubmapParams, submaps_from_roman_map
from roman_tpu.parallel.mesh import get_mesh
from roman_tpu.sim import world


def test_registrar_sharded_matches_unsharded(rng):
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    _, runs = world.make_multi_robot_world(
        rng, n_robots=2, n_objects=250, area=(60.0, 60.0, 4.0),
        traj_len=60.0, desc_dim=16,
    )
    maps = [world.roman_map_from_run(r) for r in runs]
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    params = SubmapParams(max_size=16, radius=12.0, distance=10.0)
    submaps = [submaps_from_roman_map(m, params) for m in maps]
    feats, auxs = zip(*[
        submaps_to_features(sm, cfg, capacity=16, desc_dim=16) for sm in submaps
    ])
    n0 = feats[0].centers.shape[0]
    n1 = feats[1].centers.shape[0]
    pi, pj = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
    pi, pj = pi.reshape(-1), pj.reshape(-1)

    plain = PairGridRegistrar(cfg, chunk_size=8)
    res0 = plain(feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"], pi, pj)

    mesh = get_mesh(8)
    sharded = PairGridRegistrar(cfg, chunk_size=8, mesh=mesh)
    res1 = sharded(feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"], pi, pj)

    np.testing.assert_array_equal(res0.count, res1.count)
    np.testing.assert_array_equal(res0.sel, res1.sel)
    np.testing.assert_allclose(res0.T_align, res1.T_align, atol=1e-4)


def test_registrar_sharded_flagship_shapes(rng):
    """Sharded vs unsharded equality AT THE FLAGSHIP SHAPES — submap
    capacity 40, 768-d descriptors, a chunked pair grid spanning multiple
    shard_map dispatch chunks (the same shapes bench.py runs on the real
    chip and dryrun_multichip validates on the virtual mesh)."""
    from roman_tpu.sim.world import make_pair_problem, pad_problem

    CAP, DESC = 40, 768
    n_sub = 5
    pads = [
        pad_problem(
            make_pair_problem(rng, n_common=CAP // 2, n_only1=CAP // 4,
                              n_only2=CAP // 4, desc_dim=DESC),
            CAP)
        for _ in range(n_sub)
    ]
    stack = {k: np.stack([d[k] for d in pads]) for k in pads[0]}
    from roman_tpu.align.invariants import SubmapFeatures

    ratio = np.concatenate(
        [stack["pca1"], stack["volume1"][..., None]], axis=-1)
    feats = SubmapFeatures(
        centers=jnp.asarray(stack["centers1"], jnp.float32),
        ratio_feats=jnp.asarray(ratio, jnp.float32),
        descriptors=jnp.asarray(stack["desc1"], jnp.float32),
        valid=jnp.asarray(stack["valid1"]))
    ids = np.arange(n_sub * CAP, dtype=np.int32).reshape(n_sub, CAP)
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9)
    gi, gj = np.meshgrid(np.arange(n_sub), np.arange(n_sub), indexing="ij")
    gi, gj = gi.reshape(-1), gj.reshape(-1)

    plain = PairGridRegistrar(cfg, chunk_size=16)
    res0 = plain(feats, feats, ids, ids, gi, gj)
    mesh = get_mesh(8)
    sharded = PairGridRegistrar(cfg, chunk_size=16, mesh=mesh)
    res1 = sharded(feats, feats, ids, ids, gi, gj)
    np.testing.assert_array_equal(res0.count, res1.count)
    np.testing.assert_array_equal(res0.sel, res1.sel)
    # grid diagonal = each submap registered against itself: big cliques
    diag = np.asarray(res0.count).reshape(n_sub, n_sub).diagonal()
    assert (diag >= 3).all(), diag


def test_registrar_sharded_pallas_interpret(rng):
    """The fused pallas register kernel under shard_map over the virtual
    mesh (interpret mode on CPU; on TPU pods shard_map partitions the
    kernel per device)."""
    _, runs = world.make_multi_robot_world(
        rng, n_robots=2, n_objects=120, area=(50.0, 50.0, 4.0),
        traj_len=40.0, desc_dim=8,
    )
    maps = [world.roman_map_from_run(r) for r in runs]
    cfg = RegistrationConfig(method="roman", cos_min=0.5, cos_max=0.9,
                             use_pallas=True, pallas_interpret=True)
    params = SubmapParams(max_size=8, radius=12.0, distance=12.0)
    submaps = [submaps_from_roman_map(m, params) for m in maps]
    feats, auxs = zip(*[
        submaps_to_features(sm, cfg, capacity=8, desc_dim=8) for sm in submaps
    ])
    n0 = feats[0].centers.shape[0]
    n1 = feats[1].centers.shape[0]
    pi, pj = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
    pi, pj = pi.reshape(-1)[:16], pj.reshape(-1)[:16]

    plain = PairGridRegistrar(cfg, chunk_size=16)
    res0 = plain(feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"], pi, pj)
    mesh = get_mesh(8)
    sharded = PairGridRegistrar(cfg, chunk_size=16, mesh=mesh)
    res1 = sharded(feats[0], feats[1], auxs[0]["seg_ids"], auxs[1]["seg_ids"], pi, pj)
    np.testing.assert_array_equal(res0.count, res1.count)
    np.testing.assert_array_equal(res0.sel, res1.sel)
