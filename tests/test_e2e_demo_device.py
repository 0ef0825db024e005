"""Device-mapper end-to-end gate (VERDICT r2 item 3): the same synthetic
2-robot pipeline as test_e2e_demo.py but with mapper_backend=device (the
BatchMapper fast path, params/demo_sim_device analog) — it must pass the
same loop-closure and ATE gates as the host-mapper demo."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def demo_output_device(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_device")
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
                   "min_max_extent": 0.05,
                   "mapper_backend": "device",
                   "max_segments": 256,
                   "max_points_per_segment": 256}, f)
    out = tmp / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "demo.py"),
         "-p", str(params), "-o", str(out), "--cpu"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return out


def test_device_demo_loop_closures(demo_output_device):
    g2o = (demo_output_device / "align" / "robot0_robot1"
           / "align.g2o").read_text()
    n_lc = g2o.count("EDGE_SE3:QUAT")
    assert n_lc >= 8, f"only {n_lc} cross-robot loop closures"


def test_device_demo_ate_gate(demo_output_device):
    """The device mapper must pass the SAME ATE gate as the host-mapper
    demo (test_e2e_demo.py::test_ate_gate, reference roman.yml analog)."""
    ate = float((demo_output_device / "offline_rpgo"
                 / "ate_rmse.txt").read_text())
    assert np.isfinite(ate)
    assert ate < 1.0, f"ATE RMSE {ate} too high"
