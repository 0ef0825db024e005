"""Bag-path end-to-end pipeline gate: ROS1 bags -> perception -> map ->
align -> rpgo through the full demo subprocess (VERDICT r4 item 6).

The reference's primary entry path consumes ROS bags end to end
(reference demo/mapping.py:61-131 via robotdatapy); here the repo's own
BagWriter synthesizes a 2-robot world of RGB-D + CameraInfo + Odometry +
/tf_static extrinsics, the demo runs with tiny random-weight nets (no
pretrained weights exist in this environment — the quality gate lives in
test_e2e_demo's sim path), and the gate checks the pipeline completes,
every inter-stage artifact exists, and the maps' trajectories match the
bags' odometry streams composed with the TF-resolved extrinsic."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


FRAMES = 20
H, W = 96, 128
DT = 0.25


def _make_bag(path, rng, x0=0.0, speed=0.5, drift=0.002):
    """One robot's bag: forward motion along x with mild odometry drift,
    depth boxes as 'objects', noise images, camera extrinsic on
    /tf_static. Returns (gt_rows, odom_poses)."""
    from roman_tpu.data import rosbag

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    gt_rows, odom_xyz = [], []
    with rosbag.BagWriter(path) as w:
        w.write("/tf_static", "tf2_msgs/TFMessage", {"transforms": [{
            "header": {"stamp": 0.0, "frame_id": "base"},
            "child_frame_id": "camera",
            "transform": {"translation": np.array([0.05, 0.0, 0.1]),
                          "rotation": np.array([0.0, 0, 0, 1.0])},
        }]}, 0.0)
        w.write("/camera/camera_info", "sensor_msgs/CameraInfo", {
            "header": {"stamp": 0.0, "frame_id": "camera"},
            "height": H, "width": W,
            "distortion_model": "plumb_bob", "D": np.zeros(5),
            "K": K.reshape(-1), "R": np.eye(3).reshape(-1),
            "P": np.concatenate([K, np.zeros((3, 1))], 1).reshape(-1),
        }, 0.0)
        for k in range(FRAMES):
            t = k * DT
            x_gt = x0 + speed * t
            x_od = x_gt + drift * x_gt * x_gt  # growing drift
            gt_rows.append([t, x_gt, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
            odom_xyz.append([x_od, 0.0, 0.0])
            w.write("/odom", "nav_msgs/Odometry", {
                "header": {"stamp": t, "frame_id": "odom"},
                "child_frame_id": "base",
                "pose": {"position": np.array([x_od, 0.0, 0.0]),
                         "orientation": np.array([0.0, 0, 0, 1.0])},
            }, t)
            img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
            depth_m = np.full((H, W), 4.0, np.float32)
            depth_m[20:60, 30:70] = 1.5  # a near surface to lift
            depth_m[65:90, 80:115] = 2.5
            w.write("/camera/color", "sensor_msgs/Image", {
                "header": {"stamp": t, "frame_id": "camera"},
                "height": H, "width": W, "encoding": "rgb8",
                "is_bigendian": 0, "step": W * 3, "data": img.tobytes(),
            }, t)
            w.write("/camera/depth", "sensor_msgs/Image", {
                "header": {"stamp": t, "frame_id": "camera"},
                "height": H, "width": W, "encoding": "16UC1",
                "is_bigendian": 0, "step": W * 2,
                "data": (depth_m * 1000).astype(np.uint16).tobytes(),
            }, t)
    odom_T = np.broadcast_to(np.eye(4), (FRAMES, 4, 4)).copy()
    odom_T[:, :3, 3] = np.asarray(odom_xyz)
    return np.asarray(gt_rows), odom_T


@pytest.fixture(scope="module")
def bag_demo_output(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_bag")
    rng = np.random.default_rng(11)
    odoms = {}
    for i, run in enumerate(["r0", "r1"]):
        gt_rows, odom_T = _make_bag(str(tmp / f"{run}.bag"), rng,
                                    x0=0.5 * i, speed=0.5)
        np.savetxt(str(tmp / f"gt_{run}.csv"), gt_rows)
        odoms[run] = odom_T

    params = tmp / "params"
    params.mkdir()
    # run-env indirection: ONE yaml serves both robots (reference
    # demo/README.md:151-169), ${ROBOT} resolved per run
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["r0", "r1"],
            "run_env": "ROBOT",
            "dt": DT,
            "img_data": {"type": "bag", "path": str(tmp / "${ROBOT}.bag"),
                         "topic": "/camera/color",
                         "depth_topic": "/camera/depth",
                         "camera_info_topic": "/camera/camera_info",
                         "depth_scale": 1000.0},
            "pose_data": {"type": "bag", "path": str(tmp / "${ROBOT}.bag"),
                          "topic": "/odom",
                          # exercise the TF-resolved extrinsic spec
                          "T_postmultiply": {"input_type": "tf",
                                             "parent": "base",
                                             "child": "camera"}},
        }, f)
    with open(params / "gt_pose.yaml", "w") as f:
        yaml.dump({"type": "csv", "path": str(tmp / "gt_${ROBOT}.csv")}, f)
    with open(params / "fastsam.yaml", "w") as f:
        # max_mask_len_div=1: random-weight tiny nets emit large masks
        # that the reference's default half-image cap would drop entirely
        yaml.dump({"imgsz": [H, W], "seg_arch": "tiny", "vit_arch": "tiny",
                   "batch_frames": 4, "max_masks_per_frame": 8,
                   "max_points_per_mask": 64, "conf": 0.0,
                   "min_mask_len_div": 40, "max_mask_len_div": 1}, f)
    with open(params / "mapper.yaml", "w") as f:
        yaml.dump({"min_sightings": 1, "max_t_no_sightings": 2.0,
                   "geometric_score_range": [0.05, 1.0],
                   "min_max_extent": 0.02}, f)
    with open(params / "submap_align.yaml", "w") as f:
        # semantics_dim matches the tiny ViT's 64-d embeddings
        yaml.dump({"method": "roman", "semantics_dim": 64,
                   "submap_max_size": 20,
                   "cosine_min": 0.5, "cosine_max": 0.9}, f)

    out = tmp / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "demo.py"),
         "-p", str(params), "-o", str(out), "--cpu", "--skip-self-lc"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=repo,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-3000:])
    return tmp, out, odoms


def test_bag_artifact_tree(bag_demo_output):
    _, out, _ = bag_demo_output
    for p in ["map/r0.pkl", "map/r1.pkl", "map/r0.time.txt",
              "align/r0_r1/align.g2o", "align/r0_r1/align.png",
              "align/r0_r1/align.pkl",
              "offline_rpgo/result.g2o", "offline_rpgo/r0.csv",
              "offline_rpgo/ate_rmse.txt", "params/data.yaml"]:
        assert (out / p).exists(), p


def test_bag_odometry_ingested_exactly(bag_demo_output):
    """The saved maps' trajectories must be the bags' /odom streams
    post-multiplied by the /tf_static base->camera extrinsic — the
    whole bag->pose_data->mapper chain, byte-for-byte from BagWriter."""
    import pickle

    tmp, out, odoms = bag_demo_output
    T_base_cam = np.eye(4)
    T_base_cam[:3, 3] = [0.05, 0.0, 0.1]
    for run in ["r0", "r1"]:
        with open(str(out / "map" / f"{run}.pkl"), "rb") as f:
            m = pickle.load(f)
        assert len(m.times) >= FRAMES - 2
        expect = odoms[run] @ T_base_cam
        # frame times land exactly on odom stamps (same dt)
        idx = np.round((np.asarray(m.times) - 0.0) / DT).astype(int)
        np.testing.assert_allclose(m.trajectory, expect[idx], atol=1e-6)


def test_bag_rpgo_outputs(bag_demo_output):
    """Both robots' vertices make it into the PGO result; ATE vs the GT
    csv is finite and bounded by the small injected drift (perception is
    random-weight so no LC quality gate here — the rpgo graph is
    dominated by odometry)."""
    tmp, out, _ = bag_demo_output
    for run in ["r0", "r1"]:
        # default offline_rpgo params are SPARSIFIED (2 m keyframes), so
        # the per-run csv carries the keyframe skeleton, spanning the run
        csv = np.loadtxt(str(out / "offline_rpgo" / f"{run}.csv"),
                         delimiter=",", skiprows=1, ndmin=2)
        assert csv.shape[0] >= 2
        assert csv[-1, 0] - csv[0, 0] >= (FRAMES - 1) * DT * 0.5
        # dense graph carries every frame
        dense = (out / "offline_rpgo" / "dense" /
                 f"{run}.g2o").read_text()
        n_vertices = sum(1 for ln in dense.splitlines()
                         if ln.startswith("VERTEX_SE3:QUAT"))
        assert n_vertices >= FRAMES - 2, (run, n_vertices)
    ate = float((out / "offline_rpgo" / "ate_rmse.txt").read_text())
    assert np.isfinite(ate)
    assert ate < 0.5, f"bag-path ATE {ate} out of band"
