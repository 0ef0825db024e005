"""Artifact-format stability: the g2o/json/time-file formats are the
inter-stage contract (consumed by fusion/rpgo and by external tooling in
the reference ecosystem). These tests pin the exact textual shape."""

import json
import os

import numpy as np
import pytest
import yaml

from roman_tpu.rpgo import g2o_io
from roman_tpu.rpgo.extract_odom import extract_odom_g2o
from roman_tpu.sim.world import yaw_T


def test_edge_line_has_31_tokens():
    I = g2o_io.information_matrix(0.5, 0.1)
    line = g2o_io.format_edge(3, 4, np.arange(7, dtype=float),
                              g2o_io.info_upper_from_matrix(I))
    tok = line.split()
    assert tok[0] == "EDGE_SE3:QUAT"
    assert len(tok) == 31
    assert tok[1] == "3" and tok[2] == "4"
    # info upper triangle order: row-major upper
    assert float(tok[10]) == 1 / 0.25


def test_vertex_line_has_9_tokens():
    line = g2o_io.format_vertex(7, np.arange(7, dtype=float))
    tok = line.split()
    assert tok[0] == "VERTEX_SE3:QUAT" and len(tok) == 9


def test_odometry_extraction_format(tmp_path):
    poses = np.stack([yaw_T(0.1 * k, np.array([k * 1.0, 0, 0])) for k in range(6)])
    times = np.arange(6) * 0.5
    I = g2o_io.information_matrix(0.1, 0.01)
    vlines, elines, sel_times = extract_odom_g2o(poses, times, I, None)
    assert len(vlines) == 6 and len(elines) == 5
    assert vlines[0].startswith("VERTEX_SE3:QUAT 0 ")
    assert elines[0].split()[0] == "EDGE_SE3:QUAT"
    assert len(elines[0].split()) == 31
    # sparsified: keyframes >2m apart, last always kept
    vl2, el2, st2 = extract_odom_g2o(poses, times, I, 2.0)
    assert len(vl2) < 6 and st2[-1] == times[-1]
    # relative pose of first edge is the true increment
    tok = elines[0].split()
    np.testing.assert_allclose([float(tok[3]), float(tok[4]), float(tok[5])],
                               np.linalg.inv(poses[0])[:3, :3] @ (poses[1][:3, 3] - poses[0][:3, 3]),
                               atol=1e-6)


def test_time_file_format(tmp_path):
    from roman_tpu.rpgo.extract_odom import roman_map_pkl_to_g2o
    from roman_tpu.sim import world

    rng = np.random.default_rng(0)
    _, runs = world.make_multi_robot_world(rng, n_robots=1, n_objects=50,
                                           traj_len=20.0, desc_dim=8)
    m = world.roman_map_from_run(runs[0])
    m.save(str(tmp_path / "m.pkl"))
    roman_map_pkl_to_g2o(str(tmp_path / "m.pkl"), str(tmp_path / "m.g2o"),
                         str(tmp_path / "m.time.txt"), robot_id=2)
    lines = open(tmp_path / "m.time.txt").read().splitlines()
    tok = lines[0].split()
    # 'robot_id idx t_ns xxx' (extract_odom_g2o.py:114)
    assert tok[0] == "2" and tok[1] == "0" and tok[3] == "xxx"
    assert int(tok[2]) == int(m.times[0] * 1e9)
    # round-trip through time_vertex_mapping
    tv = g2o_io.time_vertex_mapping(str(tmp_path / "m.time.txt"), use_gtsam_idx=True)
    assert g2o_io.symbol("c", 0) in tv


def test_lc_json_schema(tmp_path):
    """LC json entries carry the reference's field set (results.py:173-180)."""
    # reuse the alignment end-to-end fixture cheaply: craft one entry via
    # the writer by running a minimal alignment
    from roman_tpu.align.results import SubmapAlignResults, _write_g2o_and_json
    from roman_tpu.map.roman_map import RomanMap, SegmentData, Submap
    from roman_tpu.params.submap_align_params import (
        SubmapAlignInputOutput, SubmapAlignParams)

    seg = SegmentData(id=0, center=np.zeros(3), volume=1.0, linearity=0.1,
                      planarity=0.2, scattering=0.7, extent=np.ones(3),
                      semantic_descriptor=None, first_seen=0.0, last_seen=1.0)
    sm0 = Submap(id=0, time=0.5, segments=[seg], pose_flu=np.eye(4))
    sm1 = Submap(id=0, time=2.5, segments=[seg], pose_flu=yaw_T(0.3, np.array([1.0, 0, 0])))
    rm = RomanMap(segments=[seg], trajectory=np.stack([np.eye(4)] * 3),
                  times=np.arange(3.0))
    io = SubmapAlignInputOutput(inputs=["a", "b"], output_dir=str(tmp_path),
                                run_name="align", lc_association_thresh=1)
    results = SubmapAlignResults(
        robots_nearby_mat=np.array([[1.0]]),
        clipper_angle_mat=np.array([[0.0]]),
        clipper_dist_mat=np.array([[0.0]]),
        clipper_num_associations=np.array([[5.0]]),
        similarity_mat=None,
        submap_yaw_diff_mat=np.array([[0.0]]),
        associated_objs_mat=[[np.array([[0, 0]])]],
        T_ij_mat=np.eye(4)[None, None],
        T_ij_hat_mat=np.eye(4)[None, None],
        timing_list=[0.01],
        submap_align_params=SubmapAlignParams(),
        submap_io=io,
    )
    _write_g2o_and_json(results, [[sm0], [sm1]], [rm, rm])
    entries = json.load(open(io.output_lc_json))
    assert len(entries) == 1
    e = entries[0]
    for field in ["seconds", "nanoseconds", "names", "translation",
                  "rotation", "rotation_convention"]:
        assert field in e
    assert e["rotation_convention"] == "xyzw"
    g2o_text = open(io.output_g2o).read()
    assert g2o_text.startswith("# LC: 5\nEDGE_SE3:QUAT a0 b2")
