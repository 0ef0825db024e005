"""npz RGB-D ingestion path end to end (demo/mapping.py npz branch):
archive -> MapRunner.run -> perception frontend -> mapper -> RomanMap.
Covers the previously-untested recorded-data path (VERDICT r1 item 4)."""

import os

import numpy as np
import yaml


def _make_archive(tmp_path, T=8, H=96, W=128):
    rng = np.random.default_rng(0)
    images = (rng.uniform(0, 255, size=(T, H, W, 3))).astype(np.uint8)
    depths = np.full((T, H, W), 3.0, np.float32)
    # a few near "objects" as depth boxes
    depths[:, 30:60, 40:70] = 1.5
    times = np.arange(T) * 0.25
    npz = tmp_path / "frames.npz"
    np.savez(npz, images=images, depths=depths, times=times)
    # TUM csv pose data: slow forward motion
    rows = [[t, 0.2 * t, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0] for t in times]
    csv = tmp_path / "poses.csv"
    np.savetxt(csv, np.asarray(rows))
    return npz, csv, times


def test_npz_mapping_run(tmp_path):
    from demo import mapping

    npz, csv, times = _make_archive(tmp_path)
    params = tmp_path / "params"
    params.mkdir()
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["r0"],
            "dt": 0.25,
            "img_data_params": {"type": "npz", "path": str(npz),
                                "width": 128, "height": 96},
            "pose_data_params": {"type": "csv", "path": str(csv)},
        }, f)
    with open(params / "fastsam.yaml", "w") as f:
        yaml.dump({"imgsz": [96, 128], "seg_arch": "tiny", "vit_arch": "tiny",
                   "batch_frames": 4, "max_masks_per_frame": 8,
                   "max_points_per_mask": 64, "conf": 0.0,
                   "min_mask_len_div": 40, "max_mask_len_div": 2}, f)
    with open(params / "mapper.yaml", "w") as f:
        yaml.dump({"min_sightings": 1, "max_t_no_sightings": 2.0,
                   "geometric_score_range": [0.05, 1.0]}, f)

    roman_map, proc_times, _ = mapping.run(str(params), "r0")
    n = len(roman_map.times)
    assert n >= len(times) - 1  # arange(t0, tf, dt) excludes the endpoint
    assert roman_map.trajectory.shape == (n, 4, 4)
    # pose interpolation came from the csv
    np.testing.assert_allclose(roman_map.trajectory[:, 0, 3],
                               0.2 * np.asarray(roman_map.times), atol=1e-5)
    assert len(proc_times.total_times) == n


def test_npz_mapping_device_mapper(tmp_path):
    """Same path with mapper_backend=device (BatchMapper in the loop)."""
    from demo import mapping

    npz, csv, times = _make_archive(tmp_path)
    params = tmp_path / "params"
    params.mkdir()
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["r0"],
            "dt": 0.25,
            "img_data_params": {"type": "npz", "path": str(npz),
                                "width": 128, "height": 96},
            "pose_data_params": {"type": "csv", "path": str(csv)},
        }, f)
    with open(params / "fastsam.yaml", "w") as f:
        yaml.dump({"imgsz": [96, 128], "seg_arch": "tiny", "vit_arch": "tiny",
                   "batch_frames": 4, "max_masks_per_frame": 8,
                   "max_points_per_mask": 64, "conf": 0.0}, f)
    with open(params / "mapper.yaml", "w") as f:
        yaml.dump({"min_sightings": 1, "max_t_no_sightings": 2.0,
                   "geometric_score_range": [0.05, 1.0],
                   "mapper_backend": "device", "max_segments": 64,
                   "max_points_per_segment": 64}, f)

    roman_map, proc_times, _ = mapping.run(str(params), "r0")
    n = len(roman_map.times)
    assert n >= len(times) - 1
    assert roman_map.trajectory.shape == (n, 4, 4)


def test_time_params_clip_window(tmp_path):
    """data.yaml 'time' block clips the run to [t0, tf] (reference
    data_params.py:149-152)."""
    from demo import mapping

    npz, csv, times = _make_archive(tmp_path)
    params = tmp_path / "params"
    params.mkdir()
    with open(params / "data.yaml", "w") as f:
        yaml.dump({
            "runs": ["r0"],
            "dt": 0.25,
            "time": {"relative": True, "t0": 0.5, "tf": 1.25},
            "img_data_params": {"type": "npz", "path": str(npz),
                                "width": 128, "height": 96},
            "pose_data_params": {"type": "csv", "path": str(csv)},
        }, f)
    with open(params / "fastsam.yaml", "w") as f:
        yaml.dump({"imgsz": [96, 128], "seg_arch": "tiny", "vit_arch": "tiny",
                   "batch_frames": 4, "max_masks_per_frame": 8,
                   "max_points_per_mask": 64, "conf": 0.0}, f)
    with open(params / "mapper.yaml", "w") as f:
        yaml.dump({"min_sightings": 1, "max_t_no_sightings": 2.0,
                   "geometric_score_range": [0.05, 1.0]}, f)

    roman_map, _, _ = mapping.run(str(params), "r0")
    ts = np.asarray(roman_map.times)
    assert ts.min() >= 0.5 - 1e-6
    assert ts.max() <= 1.25 + 1e-6
    assert 2 <= len(ts) <= 4
