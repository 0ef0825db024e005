"""Pure-python ROS1 bag layer: container + message wire-format roundtrip,
high-level ImgData/PoseData/CameraParams extraction, bz2 chunks, and the
DataParams 'bag' source type (reference ingests bags via robotdatapy,
data_params.py:200-294)."""

import numpy as np
import pytest

from roman_tpu.data import rosbag
from roman_tpu.data.camera import CameraParams
from roman_tpu.data.img_data import ImgData
from roman_tpu.data.pose_data import PoseData


def _quat_wxyz_to_xyzw(w, x, y, z):
    return np.array([x, y, z, w])


def write_fixture_bag(path, compression="none", n=5):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(n, 8, 12, 3), dtype=np.uint8)
    depths = (rng.uniform(0.5, 4.0, size=(n, 8, 12)) * 1000).astype(np.uint16)
    times = 100.0 + np.arange(n) * 0.25
    xyz = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    with rosbag.BagWriter(path, compression=compression, chunk_messages=4) as w:
        for k in range(n):
            w.write("/cam/color", "sensor_msgs/Image",
                    rosbag.array_to_image(imgs[k], stamp=times[k],
                                          frame_id="cam"), times[k])
            w.write("/cam/depth", "sensor_msgs/Image",
                    rosbag.array_to_image(depths[k], stamp=times[k]), times[k])
            w.write("/odom", "nav_msgs/Odometry", {
                "header": {"stamp": times[k], "frame_id": "odom"},
                "child_frame_id": "base",
                "pose": {"position": xyz[k],
                         "orientation": np.array([0, 0, 0, 1.0])},
            }, times[k])
        w.write("/cam/info", "sensor_msgs/CameraInfo", {
            "header": {"stamp": times[0]},
            "height": 8, "width": 12,
            "K": np.array([[10.0, 0, 6], [0, 10.0, 4], [0, 0, 1]]),
            "D": np.zeros(5),
        }, times[0])
    return imgs, depths, times, xyz


def test_container_roundtrip(tmp_path):
    bag = str(tmp_path / "a.bag")
    imgs, depths, times, xyz = write_fixture_bag(bag)
    reader = rosbag.BagReader(bag)
    topics = reader.topics
    assert topics["/cam/color"] == ("sensor_msgs/Image", 5)
    assert topics["/odom"] == ("nav_msgs/Odometry", 5)
    assert topics["/cam/info"][1] == 1
    msgs = list(reader.read_messages("/cam/color"))
    assert len(msgs) == 5
    arr = rosbag.image_to_array(msgs[2][1])
    np.testing.assert_array_equal(arr, imgs[2])
    # messages come back in time order
    ts = [t for _, _, t in msgs]
    assert ts == sorted(ts)


def test_bz2_chunks(tmp_path):
    bag = str(tmp_path / "b.bag")
    imgs, _, times, _ = write_fixture_bag(bag, compression="bz2")
    reader = rosbag.BagReader(bag)
    msgs = list(reader.read_messages("/cam/color"))
    np.testing.assert_array_equal(rosbag.image_to_array(msgs[0][1]), imgs[0])
    np.testing.assert_allclose([t for _, _, t in msgs], times, atol=1e-6)


def test_img_data_from_bag(tmp_path):
    bag = str(tmp_path / "c.bag")
    imgs, depths, times, _ = write_fixture_bag(bag)
    d = ImgData.from_bag(bag, "/cam/color", depth_topic="/cam/depth",
                         depth_scale=1000.0)
    np.testing.assert_array_equal(d.images, imgs)
    np.testing.assert_allclose(d.depths, depths.astype(np.float32) / 1000.0)
    np.testing.assert_allclose(d.times, times, atol=1e-6)


def test_pose_data_from_bag(tmp_path):
    bag = str(tmp_path / "d.bag")
    _, _, times, xyz = write_fixture_bag(bag)
    pd = PoseData.from_bag(bag, "/odom")
    np.testing.assert_allclose(pd.positions(), xyz, atol=1e-9)
    np.testing.assert_allclose(pd.pose(times[1])[:3, 3], xyz[1], atol=1e-9)


def test_camera_params_from_bag(tmp_path):
    bag = str(tmp_path / "e.bag")
    write_fixture_bag(bag)
    cam = CameraParams.from_bag(bag, "/cam/info")
    assert (cam.width, cam.height) == (12, 8)
    assert cam.fx == 10.0 and cam.cy == 4.0


def test_tf_message_and_pose_stamped(tmp_path):
    bag = str(tmp_path / "f.bag")
    times = np.array([1.0, 2.0])
    with rosbag.BagWriter(bag) as w:
        for k, t in enumerate(times):
            w.write("/tf", "tf2_msgs/TFMessage", {"transforms": [{
                "header": {"stamp": t, "frame_id": "map"},
                "child_frame_id": "base",
                "transform": {"translation": np.array([k, 0.0, 0.0]),
                              "rotation": np.array([0, 0, 0, 1.0])},
            }]}, t)
            w.write("/gt", "geometry_msgs/PoseStamped", {
                "header": {"stamp": t},
                "pose": {"position": np.array([0.0, k, 0.0]),
                         "orientation": np.array([0, 0, 0, 1.0])},
            }, t)
    tf_pd = PoseData.from_bag(bag, "/tf")
    np.testing.assert_allclose(tf_pd.positions()[:, 0], [0, 1])
    gt_pd = PoseData.from_bag(bag, "/gt")
    np.testing.assert_allclose(gt_pd.positions()[:, 1], [0, 1])


def test_compressed_image(tmp_path):
    cv = pytest.importorskip("cv2")
    bag = str(tmp_path / "g.bag")
    img = np.zeros((6, 6, 3), np.uint8)
    img[2:4, 2:4] = [255, 128, 0]  # RGB
    ok, png = cv.imencode(".png", img[..., ::-1])  # encode expects BGR
    assert ok
    with rosbag.BagWriter(bag) as w:
        w.write("/cam/compressed", "sensor_msgs/CompressedImage", {
            "header": {"stamp": 3.0}, "format": "png",
            "data": png.tobytes(),
        }, 3.0)
    d = ImgData.from_bag(bag, "/cam/compressed")
    np.testing.assert_array_equal(d.images[0], img)


def test_pointcloud2_roundtrip(tmp_path):
    bag = str(tmp_path / "h.bag")
    pts = np.array([[1.0, 2.0, 3.0], [-1.0, 0.5, 2.0],
                    [np.nan, 0.0, 0.0]], np.float32)
    with rosbag.BagWriter(bag) as w:
        w.write("/lidar", "sensor_msgs/PointCloud2",
                rosbag.xyz_to_pointcloud2(pts, stamp=9.0, frame_id="lidar"),
                9.0)
    times, clouds = rosbag.read_pointclouds(bag, "/lidar")
    assert times[0] == pytest.approx(9.0)
    np.testing.assert_allclose(clouds[0], pts[:2])  # NaN row dropped


def test_data_params_bag_sources(tmp_path):
    import yaml

    from roman_tpu.params.data_params import DataParams

    bag = str(tmp_path / "i.bag")
    write_fixture_bag(bag)
    yml = tmp_path / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "runs": ["run0"],
        "img_data_params": {"type": "bag", "path": bag,
                            "topic": "/cam/color",
                            "depth_topic": "/cam/depth",
                            "camera_info_topic": "/cam/info"},
        "pose_data_params": {"type": "bag", "path": bag, "topic": "/odom"},
    }))
    dp = DataParams.from_yaml(str(yml), "run0")
    pd = dp.load_pose_data()
    assert len(pd.times) == 5
    cam = dp.load_camera_params()
    assert (cam.width, cam.height) == (12, 8)


def test_lz4_chunks_roundtrip(tmp_path):
    """lz4-compressed chunks through the pure-python frame codec."""
    bag = str(tmp_path / "j.bag")
    imgs, _, times, xyz = write_fixture_bag(bag, compression="lz4")
    reader = rosbag.BagReader(bag)
    msgs = list(reader.read_messages("/cam/color"))
    np.testing.assert_array_equal(rosbag.image_to_array(msgs[3][1]), imgs[3])
    pd = PoseData.from_bag(bag, "/odom")
    np.testing.assert_allclose(pd.positions(), xyz, atol=1e-9)


def test_lz4_codec():
    from roman_tpu.data import lz4

    # known-answer xxh32 vectors
    assert lz4.xxh32(b"") == 0x02CC5D05
    assert lz4.xxh32(b"Hello World") == 0xB1FD16EE
    # frame roundtrip (literal-run blocks), incl. multi-block
    for payload in (b"", b"abc", bytes(range(256)) * 700):
        assert lz4.decompress_frame(
            lz4.compress_frame(payload, block_size=1 << 10)) == payload
    # handcrafted block exercising the match-copy path:
    # 4 literals "abcd", match offset 4 len 8 (overlapping copy),
    # then 5 closing literals "wxyz!"
    blk = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) + \
        bytes([0x50]) + b"wxyz!"
    assert lz4.decompress_block(blk) == b"abcd" + b"abcdabcd" + b"wxyz!"
    with pytest.raises(ValueError, match="magic"):
        lz4.decompress_frame(b"\x00\x01\x02\x03\x04\x05\x06\x07")


def test_unsupported_message_type_errors():
    with pytest.raises(ValueError, match="unsupported message type"):
        rosbag.deserialize("std_msgs/String", b"\x00\x00\x00\x00")


# ---------------------------------------------------------------------------
# ROS2 (rosbag2 sqlite + CDR)
# ---------------------------------------------------------------------------

def write_fixture_bag2(path, n=4):
    from roman_tpu.data import rosbag2

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(n, 6, 9, 3), dtype=np.uint8)
    times = 50.0 + np.arange(n) * 0.5
    xyz = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    with rosbag2.Bag2Writer(path) as w:
        for k in range(n):
            w.write("/cam/color", "sensor_msgs/msg/Image",
                    rosbag.array_to_image(imgs[k], stamp=times[k]), times[k])
            w.write("/odom", "nav_msgs/msg/Odometry", {
                "header": {"stamp": times[k], "frame_id": "odom"},
                "child_frame_id": "base",
                "pose": {"position": xyz[k],
                         "orientation": np.array([0, 0, 0, 1.0])},
            }, times[k])
        w.write("/cam/info", "sensor_msgs/msg/CameraInfo", {
            "header": {"stamp": times[0]}, "height": 6, "width": 9,
            "K": np.array([[7.0, 0, 4.5], [0, 7.0, 3], [0, 0, 1]]),
        }, times[0])
    return imgs, times, xyz


def test_rosbag2_roundtrip(tmp_path):
    from roman_tpu.data import rosbag2

    bagdir = str(tmp_path / "run2")
    imgs, times, xyz = write_fixture_bag2(bagdir)
    reader = rosbag2.Bag2Reader(bagdir)
    assert reader.topics["/cam/color"] == ("sensor_msgs/msg/Image", 4)
    msgs = list(reader.read_messages("/cam/color"))
    np.testing.assert_array_equal(rosbag.image_to_array(msgs[1][1]), imgs[1])
    # metadata.yaml exists and is consistent
    import yaml

    meta = yaml.safe_load((tmp_path / "run2" / "metadata.yaml").read_text())
    assert meta["rosbag2_bagfile_information"]["message_count"] == 9


def test_rosbag2_high_level_dispatch(tmp_path):
    """ImgData/PoseData/CameraParams.from_bag work unchanged on rosbag2
    directories (format sniffed by rosbag.open_reader)."""
    bagdir = str(tmp_path / "run2")
    imgs, times, xyz = write_fixture_bag2(bagdir)
    d = ImgData.from_bag(bagdir, "/cam/color")
    np.testing.assert_array_equal(d.images, imgs)
    np.testing.assert_allclose(d.times, times, atol=1e-6)
    pd = PoseData.from_bag(bagdir, "/odom")
    np.testing.assert_allclose(pd.positions(), xyz, atol=1e-9)
    cam = CameraParams.from_bag(bagdir, "/cam/info")
    assert (cam.width, cam.height) == (9, 6)
    assert cam.fx == 7.0


def test_rosbag2_cdr_alignment(tmp_path):
    """CDR padding: string lengths that break 4/8-byte alignment must
    still deserialize exactly (alignment is relative to payload start)."""
    from roman_tpu.data import rosbag2

    m = {"header": {"stamp": 12.25, "frame_id": "abc"},  # 3+1 chars
         "child_frame_id": "x",                           # force realign
         "transform": {"translation": np.array([1.0, 2.0, 3.0]),
                       "rotation": np.array([0.0, 0.0, 0.0, 1.0])}}
    raw = rosbag2.serialize("geometry_msgs/msg/TransformStamped", m)
    out = rosbag2.deserialize("geometry_msgs/msg/TransformStamped", raw)
    assert out["header"]["frame_id"] == "abc"
    assert out["child_frame_id"] == "x"
    np.testing.assert_allclose(out["transform"]["translation"], [1, 2, 3])
    assert out["header"]["stamp"] == pytest.approx(12.25)


def test_bag_mapping_run(tmp_path):
    """ROS1 bag -> demo mapping end to end (demo/mapping.py 'bag' branch):
    bag images/depth/odometry + CameraInfo intrinsics -> MapRunner.run ->
    RomanMap (mirrors the npz-path e2e test)."""
    import yaml

    from demo import mapping

    rng = np.random.default_rng(0)
    T, H, W = 6, 96, 128
    images = rng.integers(0, 255, size=(T, H, W, 3), dtype=np.uint8)
    depths = np.full((T, H, W), 3.0, np.float32)
    depths[:, 30:60, 40:70] = 1.5
    times = np.arange(T) * 0.25
    bag = str(tmp_path / "run.bag")
    with rosbag.BagWriter(bag) as w:
        for k in range(T):
            w.write("/cam/color", "sensor_msgs/Image",
                    rosbag.array_to_image(images[k], stamp=times[k]), times[k])
            w.write("/cam/depth", "sensor_msgs/Image",
                    rosbag.array_to_image(depths[k], stamp=times[k]), times[k])
            w.write("/odom", "nav_msgs/Odometry", {
                "header": {"stamp": times[k]},
                "pose": {"position": np.array([0.2 * times[k], 0.0, 0.0]),
                         "orientation": np.array([0, 0, 0, 1.0])},
            }, times[k])
        w.write("/cam/info", "sensor_msgs/CameraInfo", {
            "header": {"stamp": 0.0}, "height": H, "width": W,
            "K": np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]),
        }, 0.0)

    params = tmp_path / "params"
    params.mkdir()
    (params / "data.yaml").write_text(yaml.safe_dump({
        "runs": ["r0"],
        "dt": 0.25,
        "img_data_params": {"type": "bag", "path": bag,
                            "topic": "/cam/color",
                            "depth_topic": "/cam/depth",
                            "camera_info_topic": "/cam/info",
                            "depth_scale": 1.0},
        "pose_data_params": {"type": "bag", "path": bag, "topic": "/odom"},
    }))
    (params / "fastsam.yaml").write_text(yaml.safe_dump({
        "imgsz": [96, 128], "seg_arch": "tiny", "vit_arch": "tiny",
        "batch_frames": 4, "max_masks_per_frame": 8,
        "max_points_per_mask": 64, "conf": 0.0}))
    (params / "mapper.yaml").write_text(yaml.safe_dump({
        "min_sightings": 1, "max_t_no_sightings": 2.0,
        "geometric_score_range": [0.05, 1.0]}))

    roman_map, proc_times, _ = mapping.run(str(params), "r0")
    n = len(roman_map.times)
    assert n >= T - 1
    np.testing.assert_allclose(roman_map.trajectory[:, 0, 3],
                               0.2 * np.asarray(roman_map.times), atol=1e-5)

# depth images in bags are float32 here (depth_scale 1.0): the fixture
# writes 32FC1, exercising the non-uint16 decode path


def test_static_transform_and_pointcloud_data(tmp_path):
    import yaml

    from roman_tpu.params.data_params import DataParams

    bag = str(tmp_path / "lidar.bag")
    pts = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, 3.0]], np.float32)
    with rosbag.BagWriter(bag) as w:
        w.write("/tf_static", "tf2_msgs/TFMessage", {"transforms": [{
            "header": {"stamp": 0.0, "frame_id": "camera"},
            "child_frame_id": "os_sensor",
            "transform": {"translation": np.array([0.1, 0.0, -0.2]),
                          "rotation": np.array([0, 0, 0, 1.0])},
        }]}, 0.0)
        w.write("/ouster/points", "sensor_msgs/PointCloud2",
                rosbag.xyz_to_pointcloud2(pts, stamp=4.0), 4.0)
    T = rosbag.read_static_transform(bag, "camera", "os_sensor")
    np.testing.assert_allclose(T[:3, 3], [0.1, 0.0, -0.2])
    with pytest.raises(KeyError):
        rosbag.read_static_transform(bag, "camera", "nope")

    yml = tmp_path / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "runs": ["r0"],
        "pointcloud_data": {"type": "bag", "path": bag,
                            "topic": "/ouster/points"},
    }))
    dp = DataParams.from_yaml(str(yml), "r0")
    times, clouds = dp.load_pointcloud_data()
    assert times[0] == pytest.approx(4.0)
    np.testing.assert_allclose(clouds[0], pts)


def test_read_poses_tf_frame_filtering(tmp_path):
    """Regression: /tf topics carry many (parent, child) pairs; read_poses
    must not interleave unrelated transforms (and supports explicit
    frame selection)."""
    from roman_tpu.data import rosbag

    path = str(tmp_path / "tf.bag")
    with rosbag.BagWriter(path) as w:
        for k in range(4):
            t = 100.0 + k
            trs = [
                {"header": {"stamp": t, "frame_id": "odom"},
                 "child_frame_id": "base_link",
                 "transform": {"translation": np.array([1.0 * k, 0, 0]),
                               "rotation": np.array([0, 0, 0, 1.0])}},
                {"header": {"stamp": t, "frame_id": "base_link"},
                 "child_frame_id": "camera",
                 "transform": {"translation": np.array([0.0, 9.0, 0]),
                               "rotation": np.array([0, 0, 0, 1.0])}},
            ]
            w.write("/tf", "tf2_msgs/TFMessage", {"transforms": trs}, t)
    # default: most frequent pair (tie -> a single consistent pair)
    times, T = rosbag.read_poses(path, "/tf")
    assert len(times) == 4
    ys = T[:, 1, 3]
    assert np.all(ys == ys[0])  # one pair only, no interleaving
    # explicit selection
    times2, T2 = rosbag.read_poses(path, "/tf", parent_frame="odom",
                                   child_frame="base_link")
    np.testing.assert_allclose(T2[:, 0, 3], [0, 1, 2, 3], atol=1e-12)
    times3, T3 = rosbag.read_poses(path, "/tf", child_frame="camera")
    np.testing.assert_allclose(T3[:, 1, 3], 9.0)
    with np.testing.assert_raises(KeyError):
        rosbag.read_poses(path, "/tf", parent_frame="nope")


def test_reader_cache_and_lazy_chunks(tmp_path):
    """open_reader returns the same parsed reader for repeated reads of
    one bag (the demo reads color/depth/camera_info from the same file),
    and invalidates on modification."""
    import cv2 as cv

    from roman_tpu.data import rosbag

    path = str(tmp_path / "c.bag")
    rng = np.random.default_rng(0)
    with rosbag.BagWriter(path, compression="bz2") as w:
        for k in range(3):
            t = 10.0 + k
            img = rng.integers(0, 255, (8, 12, 3), np.uint8)
            w.write("/cam/image", "sensor_msgs/Image",
                    rosbag.array_to_image(img, stamp=t), t)
    r1 = rosbag.open_reader(path)
    r2 = rosbag.open_reader(path)
    assert r1 is r2
    times, imgs = rosbag.read_images(path, "/cam/image")
    assert imgs.shape == (3, 8, 12, 3)
    # touching the file invalidates the cache entry
    with open(path, "ab") as f:
        f.write(b"")
    import os as _os
    _os.utime(path, ns=(1, 1))
    r3 = rosbag.open_reader(path)
    assert r3 is not r1


def test_static_transform_chained_and_tf_input_type(tmp_path):
    """Chained TF lookup (robotdatapy any_static_tf_from_bag semantics:
    reference data_params.py:39-57): no direct (parent, child) edge —
    compose along the static TF tree, traversing edges backwards where
    needed — plus the data.yaml 'input_type: tf' spec resolving against
    the pose source's own bag."""
    import yaml

    from roman_tpu.ops import se3_np
    from roman_tpu.params.data_params import DataParams, find_transformation

    bag = str(tmp_path / "tf.bag")
    rng = np.random.default_rng(7)

    def rand_T():
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return se3_np.xyz_quat_to_T(rng.normal(size=3), q)

    # tree: base -> camera, base -> imu, imu -> lidar  (camera->lidar
    # needs camera<-base->imu->lidar, first hop inverted)
    T_base_cam, T_base_imu, T_imu_lidar = rand_T(), rand_T(), rand_T()

    def tf_msg(parent, child, T):
        t, q = se3_np.T_to_xyz_quat(T)
        return {"transforms": [{
            "header": {"stamp": 0.0, "frame_id": parent},
            "child_frame_id": child,
            "transform": {"translation": t, "rotation": q}}]}

    with rosbag.BagWriter(bag) as w:
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", T_base_cam), 0.0)
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("base", "imu", T_base_imu), 0.0)
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("imu", "lidar", T_imu_lidar), 0.0)
        # odometry so the bag can serve as a pose source below
        for k in range(4):
            w.write("/odom", "nav_msgs/Odometry", {
                "header": {"stamp": float(k), "frame_id": "odom"},
                "child_frame_id": "base",
                "pose": {"position": np.array([0.5 * k, 0.0, 0.0]),
                         "orientation": np.array([0, 0, 0, 1.0])},
            }, float(k))

    T = rosbag.read_static_transform(bag, "camera", "lidar")
    expect = np.linalg.inv(T_base_cam) @ T_base_imu @ T_imu_lidar
    np.testing.assert_allclose(T, expect, atol=1e-9)
    np.testing.assert_allclose(
        rosbag.read_static_transform(bag, "lidar", "camera"),
        np.linalg.inv(expect), atol=1e-9)
    np.testing.assert_allclose(
        rosbag.read_static_transform(bag, "imu", "imu"), np.eye(4))
    with pytest.raises(KeyError):
        rosbag.read_static_transform(bag, "camera", "wheel")

    # data.yaml: pose source = the bag's odometry, post-multiplied by a
    # TF-resolved extrinsic (reference T_odombase_camera via input_type tf)
    yml = tmp_path / "data.yaml"
    yml.write_text(yaml.safe_dump({
        "runs": ["r0"],
        "pose_data": {"type": "bag", "path": bag, "topic": "/odom",
                      "T_postmultiply": {"input_type": "tf",
                                         "parent": "base",
                                         "child": "camera"}},
    }))
    dp = DataParams.from_yaml(str(yml), "r0")
    pd = dp.load_pose_data()
    odom3 = se3_np.xyz_quat_to_T(np.array([1.5, 0.0, 0.0]),
                                 np.array([0.0, 0, 0, 1.0]))
    np.testing.assert_allclose(pd.poses[3], odom3 @ T_base_cam, atol=1e-9)

    # standalone spec with explicit path
    T2 = find_transformation({"input_type": "tf", "path": bag,
                              "parent": "base", "child": "lidar"})
    np.testing.assert_allclose(T2, T_base_imu @ T_imu_lidar, atol=1e-9)


def test_static_transform_priority_and_tf_fallback(tmp_path):
    """/tf_static edges must win over /tf republishes of the same frame
    pair (a driver publishing identity on /tf before calibration loads
    must not shadow the latched static value), and a bag whose extrinsic
    lives only on /tf must resolve even when an UNRELATED /tf_static
    topic exists (fallback when the static graph lacks a path)."""
    from roman_tpu.ops import se3_np

    def tf_msg(parent, child, T):
        t, q = se3_np.T_to_xyz_quat(T)
        return {"transforms": [{
            "header": {"stamp": 0.0, "frame_id": parent},
            "child_frame_id": child,
            "transform": {"translation": t, "rotation": q}}]}

    T_true = se3_np.xyz_quat_to_T(np.array([1.0, 2.0, 3.0]),
                                  np.array([0.0, 0.0, 0.0, 1.0]))
    T_other = se3_np.xyz_quat_to_T(np.array([9.0, 9.0, 9.0]),
                                   np.array([0.0, 0.0, 0.0, 1.0]))

    # (a) same edge on both topics, /tf FIRST in time: static still wins
    bag = str(tmp_path / "shadow.bag")
    with rosbag.BagWriter(bag) as w:
        w.write("/tf", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", np.eye(4)), 0.0)
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", T_true), 5.0)
    got = rosbag.read_static_transform(bag, "base", "camera",
                                       include_non_static=True)
    np.testing.assert_allclose(got, T_true, atol=1e-9)

    # (b) extrinsic only on /tf; /tf_static holds an unrelated edge —
    # the lookup falls back to /tf edges (static graph lacks the path)
    bag2 = str(tmp_path / "fallback.bag")
    with rosbag.BagWriter(bag2) as w:
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("map", "odom", T_other), 0.0)
        w.write("/tf", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", T_true), 0.0)
        # a later republish that must NOT override first-seen
        w.write("/tf", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", T_other), 1.0)
    got2 = rosbag.read_static_transform(bag2, "base", "camera")
    np.testing.assert_allclose(got2, T_true, atol=1e-9)

    # (c) chaining across the static/dynamic boundary: odom->base on
    # /tf composes with the static base->camera edge. The /tf fallback
    # applies even without include_non_static when the static graph
    # alone lacks a path (permissive, and consistent whether or not a
    # /tf_static topic happens to exist); frames in neither topic raise.
    bag3 = str(tmp_path / "chain.bag")
    with rosbag.BagWriter(bag3) as w:
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", T_true), 0.0)
        w.write("/tf", "tf2_msgs/TFMessage",
                tf_msg("odom", "base", T_other), 0.0)
    for non_static in (False, True):
        got3 = rosbag.read_static_transform(bag3, "odom", "camera",
                                            include_non_static=non_static)
        np.testing.assert_allclose(got3, T_other @ T_true, atol=1e-9)
    with pytest.raises(KeyError):
        rosbag.read_static_transform(bag3, "odom", "wheel")


def test_static_chain_beats_direct_dynamic_edge(tmp_path):
    """Path-level static priority: a direct (base, camera) edge on /tf
    (e.g. an identity published before calibration loads) must NOT
    shadow the calibrated 2-hop /tf_static chain base->imu->camera —
    the search minimizes dynamic-edge count before hop count."""
    from roman_tpu.ops import se3_np

    def tf_msg(parent, child, T):
        t, q = se3_np.T_to_xyz_quat(T)
        return {"transforms": [{
            "header": {"stamp": 0.0, "frame_id": parent},
            "child_frame_id": child,
            "transform": {"translation": t, "rotation": q}}]}

    T_bi = se3_np.xyz_quat_to_T(np.array([0.1, 0.0, 0.2]),
                                np.array([0.0, 0.0, 0.0, 1.0]))
    T_ic = se3_np.xyz_quat_to_T(np.array([0.0, 0.05, 0.0]),
                                np.array([0.0, 0.0, 0.0, 1.0]))
    bag = str(tmp_path / "prio.bag")
    with rosbag.BagWriter(bag) as w:
        # bogus direct edge FIRST in time on /tf
        w.write("/tf", "tf2_msgs/TFMessage",
                tf_msg("base", "camera", np.eye(4)), 0.0)
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("base", "imu", T_bi), 1.0)
        w.write("/tf_static", "tf2_msgs/TFMessage",
                tf_msg("imu", "camera", T_ic), 1.0)
    got = rosbag.read_static_transform(bag, "base", "camera",
                                       include_non_static=True)
    np.testing.assert_allclose(got, T_bi @ T_ic, atol=1e-9)
