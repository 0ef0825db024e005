import os, sys, yaml
import numpy as np

def test_chunked_mapping_small_max_time(tmp_path):
    """Regression: max_time close to dt must not truncate the run (the
    old fixed 0.9*max_time span bound broke after one chunk whenever
    max_time <= ~10*dt); the chunked map must cover the full window."""
    params = tmp_path / "params"
    params.mkdir()
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["robot0"],
            "dt": 0.5,
            "img_data_params": {
                "type": "sim", "seed": 5, "n_robots": 1, "n_objects": 150,
                "area": [40.0, 40.0, 4.0], "traj_len": 30.0, "desc_dim": 8,
            },
        }, f)
    from demo.mapping import mapping, run

    # full-run reference span
    full_map, _, _ = run(str(params), "robot0")
    full_span = full_map.times[-1] - full_map.times[0]

    out = tmp_path / "chunked"
    # max_time = 4*dt: every full chunk spans max_time - dt = 1.5 s,
    # far below the old 0.9*max_time = 1.8 s bound
    mapping(str(params), str(out), "robot0", max_time=2.0)
    import pickle
    with open(str(out) + ".pkl", "rb") as f:
        m = pickle.load(f)
    span = m.times[-1] - m.times[0]
    assert span >= full_span - 2.0 - 1e-6, \
        f"chunked map covers {span:.2f}s of {full_span:.2f}s"
