"""3-robot end-to-end gate: the all-robot-pairs alignment sweep + fused
a/b/c pose graph + multi-robot PCM grouping (reference demo.py:138-161
loops robot pairs serially; params/demo_sim3 is the full-size variant).
Compact world keeps this a few minutes on the CPU mesh."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def demo3_output(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e3")
    params = tmp / "params"
    params.mkdir()
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["robot0", "robot1", "robot2"],
            "dt": 0.25,
            "img_data_params": {
                "type": "sim", "seed": 11, "n_robots": 3, "n_objects": 400,
                "area": [70.0, 70.0, 4.0], "traj_len": 70.0, "desc_dim": 32,
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


def test_all_robot_pairs_aligned(demo3_output):
    """Every robot pair gets an align/ directory with a g2o (reference
    demo.py:138-161 output layout)."""
    n_lc_total = 0
    for pair in ("robot0_robot1", "robot0_robot2", "robot1_robot2"):
        g2o = demo3_output / "align" / pair / "align.g2o"
        assert g2o.exists(), pair
        n_lc_total += sum(1 for ln in g2o.read_text().splitlines()
                          if ln.startswith("EDGE_SE3:QUAT"))
    assert n_lc_total >= 4, f"only {n_lc_total} candidate LC edges"


def test_3robot_rpgo_and_ate(demo3_output):
    assert (demo3_output / "offline_rpgo" / "result.g2o").exists()
    ate = float((demo3_output / "offline_rpgo" / "ate_rmse.txt").read_text())
    assert np.isfinite(ate)
    assert ate < 1.5, f"3-robot ATE RMSE {ate} too high"
