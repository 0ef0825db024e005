import json
import os

import numpy as np
import pytest
import yaml

from roman_tpu.params.submap_align_params import SubmapAlignParams, SubmapAlignInputOutput
from roman_tpu.align.submap_align import submap_align
from roman_tpu.sim import world
from roman_tpu.map.roman_map import submaps_from_roman_map, SubmapParams


@pytest.fixture(scope="module")
def sim_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("align")
    rng = np.random.default_rng(42)
    _, runs = world.make_multi_robot_world(
        rng, n_robots=2, n_objects=500, area=(80.0, 80.0, 4.0), traj_len=150.0,
        desc_dim=32, odom_drift_per_m=0.005,
    )
    maps = [world.roman_map_from_run(r) for r in runs]
    gt_files = []
    for k, r in enumerate(runs):
        maps[k].save(str(tmp / f"robot{k}.pkl"))
        csv = str(tmp / f"gt{k}.csv")
        world.write_gt_csv(r, csv)
        gt_yaml = str(tmp / f"gt{k}.yaml")
        with open(gt_yaml, "w") as f:
            yaml.dump({"type": "csv", "path": csv}, f)
        gt_files.append(gt_yaml)
    return tmp, runs, maps, gt_files


def test_submap_align_end_to_end(sim_setup):
    tmp, runs, maps, gt_files = sim_setup
    sm_params = SubmapAlignParams(
        method="roman", semantics_dim=32, submap_max_size=30,
        cosine_min=0.5, cosine_max=0.9,
    )
    out_dir = str(tmp / "out")
    sm_io = SubmapAlignInputOutput(
        inputs=[str(tmp / "robot0.pkl"), str(tmp / "robot1.pkl")],
        output_dir=out_dir,
        run_name="align",
        input_gt_pose_yaml=gt_files,
        robot_names=["robot0", "robot1"],
    )
    results = submap_align(sm_params, sm_io, chunk_size=32)

    n0, n1 = results.clipper_num_associations.shape
    assert n0 > 3 and n1 > 3

    # loop closures must be found where robots were actually nearby
    accepted = results.clipper_num_associations >= sm_io.lc_association_thresh
    nearby = ~np.isnan(results.robots_nearby_mat)
    assert accepted.sum() > 0, "no loop closures found in overlapping world"

    # precision: accepted LCs should have small translation error vs GT
    errs = results.clipper_dist_mat[accepted & nearby]
    errs = errs[~np.isnan(errs)]
    assert len(errs) > 0
    good = (errs < 3.0).mean()
    assert good >= 0.7, f"LC precision too low: {good} (errors {errs})"

    # artifacts written (results.py:122-246 parity)
    for path in [
        sm_io.output_img, sm_io.output_matrix, sm_io.output_pkl,
        sm_io.output_timing, sm_io.output_params, sm_io.output_g2o,
        sm_io.output_lc_json,
    ] + sm_io.output_submaps:
        assert os.path.exists(path), path

    # g2o format check
    with open(sm_io.output_g2o) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    lc_lines = [ln for ln in lines if ln.startswith("# LC:")]
    edge_lines = [ln for ln in lines if ln.startswith("EDGE_SE3:QUAT")]
    assert len(lc_lines) == len(edge_lines) == int(accepted.sum() - (
        np.isnan(results.T_ij_hat_mat[accepted]).any(axis=(1, 2)).sum()))
    parts = edge_lines[0].split()
    assert parts[1].startswith("a") and parts[2].startswith("b")
    assert len(parts) == 31  # EDGE_SE3:QUAT id id xyz quat + 21 info entries

    with open(sm_io.output_lc_json) as f:
        lcs = json.load(f)
    assert len(lcs) == len(edge_lines)
    assert lcs[0]["rotation_convention"] == "xyzw"

    # submap json round-trip via the segment-slam loader
    from roman_tpu.map.roman_map import load_segment_slam_submaps

    sms = load_segment_slam_submaps(sm_io.output_submaps[0], robot_name="robot0")
    assert len(sms) > 0 and len(sms[0].segments) > 0


def test_submap_partition_semantics(sim_setup):
    tmp, runs, maps, gt_files = sim_setup
    params = SubmapParams(max_size=25, radius=15.0, distance=10.0)
    submaps = submaps_from_roman_map(maps[0], params)
    assert len(submaps) >= 2
    for sm in submaps:
        assert 0 < len(sm.segments) <= 25
        # segments expressed in the gravity-aligned center frame: centers
        # should be within radius of origin (xy)
        c = np.stack([np.asarray(s.center).reshape(3) for s in sm.segments])
        assert np.all(np.linalg.norm(c[:, :2], axis=1) < 15.0 + 3.0)
    # successive submap centers are >= `distance` apart (except time-trigger)
    pos = np.stack([sm.pose_flu[:3, 3] for sm in submaps])
    gaps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    assert np.all(gaps > 5.0)


def test_force_fill_partition(sim_setup):
    tmp, runs, maps, gt_files = sim_setup
    params = SubmapParams(max_size=20, overlap=10, force_fill_submaps=True)
    submaps = submaps_from_roman_map(maps[0], params)
    assert len(submaps) >= 2
    assert all(len(sm) <= 20 for sm in submaps)
    # consecutive submaps share segments (overlap)
    ids0 = {s.id for s in submaps[0].segments}
    ids1 = {s.id for s in submaps[1].segments}
    assert ids0 & ids1

def test_skip_distance_zero_and_no_gt(sim_setup):
    """Edge probes: skip_distance=0 hard-gates every pair (empty g2o,
    reference submap_align.py:136-142), and input_gt_pose_yaml=[None,None]
    exercises the est-pose gating / reduced outputs path."""
    tmp, runs, maps, gt_files = sim_setup
    sm_params = SubmapAlignParams(
        method="roman", semantics_dim=32, submap_max_size=30,
        cosine_min=0.5, cosine_max=0.9,
    )
    out0 = str(tmp / "out_skip0")
    sm_io = SubmapAlignInputOutput(
        inputs=[str(tmp / "robot0.pkl"), str(tmp / "robot1.pkl")],
        output_dir=out0, run_name="align",
        input_gt_pose_yaml=gt_files,
        robot_names=["robot0", "robot1"],
        skip_distance=0.0,
    )
    results = submap_align(sm_params, sm_io, chunk_size=32)
    assert (results.clipper_num_associations
            >= sm_io.lc_association_thresh).sum() == 0
    with open(sm_io.output_g2o) as f:
        assert not [ln for ln in f.read().splitlines()
                    if ln.startswith("EDGE_SE3:QUAT")]

    out_nogt = str(tmp / "out_nogt")
    sm_io2 = SubmapAlignInputOutput(
        inputs=[str(tmp / "robot0.pkl"), str(tmp / "robot1.pkl")],
        output_dir=out_nogt, run_name="align",
        input_gt_pose_yaml=[None, None],
        robot_names=["robot0", "robot1"],
    )
    results2 = submap_align(sm_params, sm_io2, chunk_size=32)
    accepted = results2.clipper_num_associations >= sm_io2.lc_association_thresh
    assert accepted.sum() > 0  # est-pose gating still finds the overlap
    assert os.path.exists(sm_io2.output_g2o)
    assert os.path.exists(sm_io2.output_img)


def test_pack_result_roundtrip_all_bit_positions():
    """_pack_result/_unpack_result exactness over every bit position.

    The sel bitfield packs 32 bools per int32 word via left-shift; bit 31
    lands in the sign bit (defined wraparound in XLA) and _unpack_result
    relies on numpy's arithmetic-shift low-bit semantics. Guard the pair
    against refactors by round-tripping each single-bit pattern, the
    all-ones pattern, and random patterns, at an n*m that is NOT a
    multiple of 32 (exercises the padding tail). Also checks exact f32
    bitcasts incl. negative zero, denormals, inf and nan payloads.
    """
    import jax.numpy as jnp

    from roman_tpu.align.registration import RegistrationResult
    from roman_tpu.align.submap_align import _pack_result, _unpack_result

    n, m = 7, 10  # nm=70 -> 3 words, 26 pad bits
    nm = n * m
    rng = np.random.default_rng(0)
    patterns = [np.zeros(nm, bool), np.ones(nm, bool)]
    for b in range(nm):  # every bit position incl. each word's bit 31
        one = np.zeros(nm, bool)
        one[b] = True
        patterns.append(one)
    patterns += [rng.random(nm) < 0.5 for _ in range(4)]
    sel = np.stack(patterns).reshape(len(patterns), n, m)

    batch = (len(patterns),)
    specials = np.array([-0.0, np.inf, -np.inf, np.nan, 1e-45, -1e-39,
                         3.14159, -2.5e20], np.float32)
    T = rng.choice(specials, size=batch + (4, 4)).astype(np.float32)
    res = RegistrationResult(
        sel=jnp.asarray(sel), count=jnp.asarray(sel.sum((-2, -1))),
        T_align=jnp.asarray(T),
        ok=jnp.asarray(rng.random(batch) < 0.5),
        u=None, score=jnp.asarray(specials[rng.integers(0, 8, batch)]),
        converged=jnp.asarray(rng.random(batch) < 0.5))

    packed = np.asarray(_pack_result(res))
    out = _unpack_result(packed, n, m, has_converged=True)
    np.testing.assert_array_equal(out.sel, sel)
    np.testing.assert_array_equal(out.count, np.asarray(res.count))
    np.testing.assert_array_equal(
        out.T_align.view(np.int32), T.view(np.int32))  # bit-exact incl. nan
    np.testing.assert_array_equal(out.ok, np.asarray(res.ok))
    np.testing.assert_array_equal(
        out.score.view(np.int32), np.asarray(res.score).view(np.int32))
    np.testing.assert_array_equal(out.converged, np.asarray(res.converged))


def test_align_empty_maps_writes_empty_artifacts(tmp_path):
    """A degenerate map (no segments — e.g. perception found nothing)
    must yield a complete, empty artifact set rather than kill the
    pipeline (failure-recovery; the rpgo stage then runs on odometry)."""
    from roman_tpu.align.registration import RegistrationConfig
    from roman_tpu.align.results import save_submap_align_results
    from roman_tpu.align.submap_align import align_submap_lists
    from roman_tpu.map.roman_map import RomanMap

    sm_params = SubmapAlignParams(method="roman", semantics_dim=8)
    out = tmp_path / "out_empty"
    out.mkdir()
    sm_io = SubmapAlignInputOutput(
        inputs=["x.pkl", "y.pkl"], output_dir=str(out), run_name="align",
        input_gt_pose_yaml=[None, None], robot_names=["r0", "r1"])
    res = align_submap_lists([[], []], sm_params.get_registration_config(),
                             sm_params, sm_io)
    assert res.clipper_num_associations.shape == (0, 0)
    assert res.T_ij_mat.shape == (0, 0, 4, 4)
    maps = [RomanMap(segments=[], times=np.zeros(1),
                     trajectory=np.eye(4)[None]) for _ in range(2)]
    save_submap_align_results(res, [[], []], maps)
    assert os.path.exists(sm_io.output_g2o)
    with open(sm_io.output_g2o) as f:
        assert f.read().strip() == ""
    assert os.path.exists(sm_io.output_lc_json)
