import numpy as np
import pytest

from roman_tpu.data.img_data import ImgData
from roman_tpu.data.pose_data import PoseData
from roman_tpu.data.camera import CameraParams
from roman_tpu.map.align_pointcloud import AlignPointCloud
from roman_tpu.sim.world import yaw_T


def test_img_data_npz(tmp_path, rng):
    times = np.arange(5) * 0.5
    images = (rng.uniform(size=(5, 8, 8, 3)) * 255).astype(np.uint8)
    depths = rng.uniform(1, 5, size=(5, 8, 8)).astype(np.float32)
    np.savez(tmp_path / "d.npz", times=times, images=images, depths=depths)
    d = ImgData.from_npz(str(tmp_path / "d.npz"))
    img, dep = d.nearest([0.6])
    np.testing.assert_array_equal(img[0], images[1])
    np.testing.assert_allclose(dep[0], depths[1])


def test_pose_data_interp_and_tol(rng):
    times = np.arange(10, dtype=float)
    poses = np.stack([yaw_T(0.1 * k, np.array([k, 0, 0], float)) for k in range(10)])
    pd = PoseData(times=times, poses=poses, time_tol=0.5)
    mid = pd.pose(2.5)
    np.testing.assert_allclose(mid[:3, 3], [2.5, 0, 0], atol=1e-6)
    with pytest.raises(ValueError):
        pd.pose(20.0)
    assert pd.nearest_time(3.2) == 3.0


def test_align_pointcloud_projects_depth(rng):
    cam = CameraParams.simple(width=64, height=48, f=40.0)
    # robot moving forward along x (FLU body); sensor = camera (RDF) with
    # standard FLU->RDF extrinsics baked into the test cloud instead
    times = np.arange(5, dtype=float) * 0.1
    poses = np.stack([np.eye(4)] * 5)
    pd = PoseData(times=times, poses=poses, time_tol=1.0)
    apc = AlignPointCloud(cam, T_camera_rangesense=np.eye(4), pose_data=pd)

    # points on the optical axis at known depths (camera frame, z forward)
    pts = np.array([[[0.0, 0.0, 2.0], [0.1, 0.05, 3.0], [0.0, 0.0, -1.0]]])
    valid = np.array([[True, True, True]])
    depth = apc.depth_images(pts, valid, t_clouds=[0.1], t_imgs=[0.1])
    assert depth.shape == (1, 48, 64)
    # center pixel sees the closest on-axis point
    assert abs(depth[0, 24, 32] - 2.0) < 1e-5
    # behind-camera point never rendered
    assert (depth >= 0).all()
    assert np.count_nonzero(depth[0]) == 2


def test_img_data_from_zip(tmp_path, rng):
    """Zip-archive ingestion (reference image-zip path, README.md:122)."""
    import zipfile

    import cv2 as cv

    from roman_tpu.data.img_data import ImgData

    zpath = tmp_path / "frames.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for k in range(3):
            t = 1000.0 + 0.5 * k
            img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
            ok, buf = cv.imencode(".png", img)
            zf.writestr(f"{t:.6f}.png", buf.tobytes())
            d = (rng.uniform(500, 5000, (24, 32))).astype(np.uint16)
            ok, dbuf = cv.imencode(".png", d)
            zf.writestr(f"depth/{t:.6f}.png", dbuf.tobytes())
    data = ImgData.from_zip(str(zpath))
    assert data.images.shape == (3, 24, 32, 3)
    assert data.depths.shape == (3, 24, 32)
    np.testing.assert_allclose(data.times, [1000.0, 1000.5, 1001.0])
    assert data.depths.max() <= 5.0 + 1e-6  # scaled to meters
