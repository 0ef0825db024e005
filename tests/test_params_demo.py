"""params/demo: the reference-shaped recorded-data config family
(mirrors /root/reference/params/demo) must load end to end against
fixture bags laid out like the Kimera-Multi demo data — reference data
schema keys (img_data/depth_data/pose_data, run_env indirection,
T_camera_flu post-multiply, gt csv_options)."""

import os

import numpy as np
import pytest

from roman_tpu.data import rosbag


@pytest.fixture()
def demo_data(tmp_path, monkeypatch):
    """${ROMAN_DEMO_DATA} with <robot>_camera.bag / <robot>_vio.bag /
    <robot>_gt.csv for two robots, on the reference topic names."""
    cv = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    T, H, W = 4, 24, 32
    for robot in ("sparkal1", "sparkal2"):
        times = 1234.0 + np.arange(T) * 0.5
        with rosbag.BagWriter(str(tmp_path / f"{robot}_camera.bag")) as w:
            for k, t in enumerate(times):
                img = rng.integers(0, 255, (H, W, 3), np.uint8)
                ok, jpg = cv.imencode(".jpg", img[..., ::-1])
                assert ok
                w.write(f"/{robot}/forward/color/image_raw/compressed",
                        "sensor_msgs/CompressedImage",
                        {"header": {"stamp": t}, "format": "jpeg",
                         "data": jpg.tobytes()}, t)
                depth = (rng.uniform(500, 4000, (H, W))).astype(np.uint16)
                w.write(f"/{robot}/forward/depth/image_rect_raw",
                        "sensor_msgs/Image",
                        rosbag.array_to_image(depth, stamp=t), t)
            w.write(f"/{robot}/forward/color/camera_info",
                    "sensor_msgs/CameraInfo",
                    {"header": {"stamp": times[0]}, "height": H, "width": W,
                     "K": np.array([[25.0, 0, W / 2], [0, 25.0, H / 2],
                                    [0, 0, 1]])}, times[0])
        with rosbag.BagWriter(str(tmp_path / f"{robot}_vio.bag")) as w:
            for k, t in enumerate(times):
                w.write(f"/{robot}/kimera_vio_ros/odometry",
                        "nav_msgs/Odometry",
                        {"header": {"stamp": t},
                         "pose": {"position": np.array([0.5 * k, 0.0, 0.0]),
                                  "orientation": np.array([0, 0, 0, 1.0])}},
                        t)
        # gt csv in the reference's EuRoC-ish column layout:
        # t_ns x y z qw qx qy qz (orientation col_nums [5,6,7,4])
        rows = [[t * 1e9, 0.5 * k, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
                for k, t in enumerate(times)]
        np.savetxt(tmp_path / f"{robot}_gt.csv",
                   np.asarray(rows), delimiter=",",
                   header="timestamp_kf,x,y,z,qw,qx,qy,qz")
    monkeypatch.setenv("ROMAN_DEMO_DATA", str(tmp_path))
    return tmp_path


def test_data_yaml_loads_bags(demo_data, monkeypatch):
    from roman_tpu.data.img_data import ImgData
    from roman_tpu.params.data_params import DataParams

    dp = DataParams.from_yaml("params/demo/data.yaml", "sparkal1")
    assert dp.runs == ["sparkal1", "sparkal2"]
    dp.set_run_env("sparkal1")

    pd = dp.load_pose_data()
    assert len(pd.times) == 4
    # loaded poses stay T_odom_camera (identity rotations here);
    # T_camera_flu is exposed separately for the mapper's FLU trajectory
    # (reference run.py:94-95 — it is NOT baked into the pose stream)
    R = pd.poses[0][:3, :3]
    assert np.allclose(R, np.eye(3))
    T_cf = dp.T_camera_flu
    assert T_cf is not None and not np.allclose(T_cf[:3, :3], np.eye(3))
    cam = dp.load_camera_params()
    assert (cam.width, cam.height) == (32, 24)

    from roman_tpu.utils import expandvars_recursive

    spec = dp.img_data_params
    img_data = ImgData.from_bag(expandvars_recursive(spec["path"]),
                                expandvars_recursive(spec["topic"]))
    assert img_data.images.shape == (4, 24, 32, 3)


def test_gt_pose_yaml_csv_options(demo_data, monkeypatch):
    import yaml

    from roman_tpu.data.pose_data import PoseData

    monkeypatch.setenv("ROBOT", "sparkal2")
    with open("params/demo/gt_pose.yaml") as f:
        spec = yaml.safe_load(f)
    pd = PoseData.from_yaml_spec(spec)
    assert len(pd.times) == 4
    # timescale 1e-9 converts ns -> s
    assert 1230.0 < pd.times[0] < 1240.0
    np.testing.assert_allclose(pd.positions()[:, 0], [0, 0.5, 1.0, 1.5],
                               atol=1e-9)
    np.testing.assert_allclose(pd.poses[0][:3, :3], np.eye(3), atol=1e-12)


def test_all_param_files_load():
    from roman_tpu.params.fastsam_params import FastSAMParams
    from roman_tpu.params.mapper_params import MapperParams
    from roman_tpu.params.offline_rpgo_params import OfflineRPGOParams
    from roman_tpu.params.submap_align_params import SubmapAlignParams

    f = FastSAMParams.from_yaml("params/demo/fastsam.yaml")
    assert f.semantics == "dino" and f.frame_descriptor == "dino-gem"
    m = MapperParams.from_yaml("params/demo/mapper.yaml")
    assert m.min_sightings == 2
    s = SubmapAlignParams.from_yaml("params/demo/submap_align.yaml")
    assert s.method == "roman" and s.submap_max_size == 40 and s.use_pallas
    o = OfflineRPGOParams.from_yaml("params/demo/offline_rpgo.yaml")
    assert o.lc_t_std == 2.0


def test_bag_depth_data_block(demo_data, monkeypatch):
    """demo/mapping 'bag' branch with a separate depth_data source."""
    from demo import mapping as demo_mapping
    from roman_tpu.params.data_params import DataParams

    dp = DataParams.from_yaml("params/demo/data.yaml", "sparkal1")
    dp.set_run_env("sparkal1")
    # exercise only the ingestion part of the branch via ImgData + the
    # depth_data attach logic (run() would need network weights)
    import os

    from roman_tpu.data.img_data import ImgData
    from roman_tpu.utils import expandvars_recursive as _exp

    spec = dp.img_data_params
    img_data = ImgData.from_bag(os.path.expanduser(_exp(spec["path"])),
                                _exp(spec["topic"]))
    assert img_data.depths is None
    dspec = dp.depth_data_params
    dt_, darr = rosbag.read_images(os.path.expanduser(_exp(dspec["path"])),
                                   _exp(dspec["topic"]))
    assert darr.dtype == np.uint16 and darr.shape == (4, 24, 32)


def test_sibling_param_families_load():
    """demo_aligned_depth / demo_no_gpu / kimera_multi_data mirror the
    reference's param directories (same files, same deltas vs demo)."""
    import yaml

    from roman_tpu.params.data_params import DataParams
    from roman_tpu.params.fastsam_params import FastSAMParams
    from roman_tpu.params.submap_align_params import SubmapAlignParams

    d = DataParams.from_yaml("params/demo_aligned_depth/data.yaml", "sparkal1")
    assert "aligned_depth_to_color" in d.depth_data_params["topic"]
    f = FastSAMParams.from_yaml("params/demo_no_gpu/fastsam.yaml")
    assert f.semantics in (None, "none") and f.frame_descriptor is None
    s = SubmapAlignParams.from_yaml("params/demo_no_gpu/submap_align.yaml")
    assert s.method in ("roman_no_semantics", "pcavolgrav")
    k = DataParams.from_yaml("params/kimera_multi_data/data.yaml", "thoth")
    assert len(k.runs) == 6 and k.run_env == "ROBOT"
    with open("params/kimera_multi_data/gt_pose.yaml") as fh:
        spec = yaml.safe_load(fh)
    assert spec["csv_options"]["cols"]["time"] == ["#timestamp_kf"]


def test_gt_pose_header_name_cols(tmp_path, monkeypatch):
    """csv_options 'cols' schema: columns resolved by header name
    (kimera_multi_data/gt_pose.yaml), deliberately permuted vs col_nums."""
    import yaml

    from roman_tpu.data.pose_data import PoseData

    path = tmp_path / "thoth.csv"
    # 'junk' column shifts everything right, so a col_nums fallback would
    # read wrong values — passes only via header-name resolution
    rows = [[t * 1e9, 99.0, 7.0, 2.0 * k, 0.0, 1.0, 0.0, 0.0, 0.0]
            for k, t in enumerate(1000.0 + np.arange(4))]
    with open(path, "w") as fh:
        fh.write("#timestamp_kf,junk,x,y,z,qw,qx,qy,qz\n")
        for r in rows:
            fh.write(",".join(f"{v:.9f}" for v in r) + "\n")
    monkeypatch.setenv("KMD_GT_PATH", str(tmp_path))
    monkeypatch.setenv("ROBOT", "thoth")
    with open("params/kimera_multi_data/gt_pose.yaml") as fh:
        spec = yaml.safe_load(fh)
    pd = PoseData.from_yaml_spec(spec)
    assert len(pd.times) == 4 and 999.0 < pd.times[0] < 1001.0
    np.testing.assert_allclose(pd.positions()[:, 1], [0, 2, 4, 6], atol=1e-6)
    np.testing.assert_allclose(pd.poses[0][:3, :3], np.eye(3), atol=1e-12)


def test_gt_pose_cols_partial_header_falls_back(tmp_path):
    """Regression: a header matching only the time name (position names
    absent) must fall back to col_nums instead of raising KeyError."""
    from roman_tpu.data.pose_data import PoseData

    path = tmp_path / "weird.csv"
    with open(path, "w") as fh:
        fh.write("#timestamp_kf,tx,ty,tz,qw,qx,qy,qz\n")
        for k in range(3):
            fh.write(f"{(1000.0 + k) * 1e9:.0f},{0.5 * k},0,0,1,0,0,0\n")
    spec = {"type": "csv", "path": str(path), "csv_options": {
        "cols": {"time": ["#timestamp_kf"], "position": ["x", "y", "z"],
                 "orientation": ["qx", "qy", "qz", "qw"]},
        "col_nums": {"time": [0], "position": [1, 2, 3],
                     "orientation": [5, 6, 7, 4]},
        "timescale": 1e-9}}
    pd = PoseData.from_yaml_spec(spec)
    assert len(pd.times) == 3
    np.testing.assert_allclose(pd.positions()[:, 0], [0, 0.5, 1.0], atol=1e-9)
