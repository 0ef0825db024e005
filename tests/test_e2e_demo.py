"""End-to-end pipeline gate: the reference's only CI signal is the full
demo with an ATE-RMSE threshold (.github/workflows/roman.yml:102-117,
ATE < 1.5 m on recorded data). Equivalent here: a compact synthetic
2-robot world through demo/demo.py; gate on loop closures found + final
ATE, scaled to the sim's odometry drift."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def demo_output(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    params = tmp / "params"
    params.mkdir()
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["robot0", "robot1"],
            "dt": 0.25,
            "img_data_params": {
                "type": "sim", "seed": 3, "n_robots": 2, "n_objects": 400,
                "area": [70.0, 70.0, 4.0], "traj_len": 80.0, "desc_dim": 32,
            },
        }, f)
    with open(params / "submap_align.yaml", "w") as f:
        yaml.dump({"method": "roman", "semantics_dim": 32,
                   "submap_max_size": 25, "cosine_min": 0.5,
                   "cosine_max": 0.9}, f)
    with open(params / "mapper.yaml", "w") as f:
        yaml.dump({"min_2d_iou": None, "min_sightings": 2,
                   "max_t_no_sightings": 0.6,
                   "geometric_score_range": [0.15, 1.0],
                   "min_max_extent": 0.05}, f)
    out = tmp / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "demo.py"),
         "-p", str(params), "-o", str(out), "--cpu"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return out


def test_artifact_tree(demo_output):
    out = demo_output
    for p in ["map/robot0.pkl", "map/robot1.pkl", "map/robot0.time.txt",
              "align/robot0_robot1/align.g2o", "align/robot0_robot1/align.png",
              "offline_rpgo/result.g2o", "offline_rpgo/result.png",
              "offline_rpgo/robot0.csv", "offline_rpgo/ate_rmse.txt",
              "params/data.yaml"]:
        assert (out / p).exists(), p


def test_loop_closures_found(demo_output):
    # this config reliably yields 13 cross-robot LC edges; gate hugs it
    g2o = (demo_output / "align" / "robot0_robot1" / "align.g2o").read_text()
    n_lc = g2o.count("EDGE_SE3:QUAT")
    assert n_lc >= 8, f"only {n_lc} cross-robot loop closures"


def test_ate_gate(demo_output):
    """CI acceptance gate (roman.yml ATE < 1.5 m analog). The demo
    achieves 0.40 m on this world; 1.0 m leaves 2.5x margin for
    platform/jit variation while staying under the reference's gate."""
    ate = float((demo_output / "offline_rpgo" / "ate_rmse.txt").read_text())
    assert np.isfinite(ate)
    assert ate < 1.0, f"ATE RMSE {ate} too high"


def test_submap_viz_cli(demo_output):
    """demo/submap_viz.py (reference roman/align/submap_viz.py CLI
    parity, offscreen): per-run submap browsing sheets + the per-pair
    composite over the result matrix with accept/reject coloring."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "submap_viz.py"),
         "-p", str(demo_output / "params"), "-o", str(demo_output), "-t"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    viz = demo_output / "submap_viz"
    for name in ["robot0.png", "robot1.png", "all_runs.png",
                 "robot0_robot1_matrix.png"]:
        assert (viz / name).exists() and (viz / name).stat().st_size > 0, name


def test_viz_cli_scripts(demo_output):
    """The post-hoc viz CLIs run against the demo's artifacts:
    o3d_viz/map_viz (3D map render) and association_vid (per-LC
    association figures, reference demo/association_vid.py)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    png = demo_output / "map_render.png"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "o3d_viz.py"),
         str(demo_output / "map" / "robot0.pkl"), "-o", str(png),
         "--show-text"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert png.exists() and png.stat().st_size > 0

    vid_dir = demo_output / "assoc_figs"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "association_vid.py"),
         str(demo_output / "align" / "robot0_robot1" / "align.pkl"),
         "-o", str(vid_dir), "-n", "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    figs = list(vid_dir.glob("*.png"))
    assert len(figs) >= 1, "no association figures written"

    # camera-frame association video (reference demo/association_vid.py
    # :63-317): side-by-side camera frames, reprojected match outlines,
    # nearest-pixel match lines
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "association_vid.py"),
         str(demo_output / "align" / "robot0_robot1" / "align.pkl"),
         "-o", str(vid_dir), "--camera-video"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    vid = vid_dir / "association_camera.mp4"
    assert vid.exists() and vid.stat().st_size > 0, "no camera video"
