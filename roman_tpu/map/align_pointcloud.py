"""LiDAR ingestion: motion-compensated pointcloud -> depth-in-camera.

Parity with reference roman/map/align_pointcloud.py: interpolate the pose
between the pointcloud and image timestamps (:59-97), project points into
the pinhole camera (:99-115), keep in-frame points (:117-130). The
reference loops through cv.projectPoints per cloud; here a whole batch of
(cloud, image-time) pairs projects in one jit'd program, and the result is
rendered as a sparse depth image so the depth-based mask-lifting path
(perception.wrapper) is reused unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from roman_tpu.data.camera import CameraParams
from roman_tpu.data.pose_data import PoseData
from roman_tpu.ops import se3


@dataclasses.dataclass
class AlignPointCloudParams:
    max_range: float = 60.0
    z_near: float = 0.05


class AlignPointCloud:
    """T_camera_rangesense: static extrinsics (the reference reads them
    from bag TF, :43-57; here passed explicitly)."""

    def __init__(self, camera: CameraParams, T_camera_rangesense: np.ndarray,
                 pose_data: Optional[PoseData] = None,
                 params: AlignPointCloudParams = AlignPointCloudParams()):
        self.camera = camera
        self.T_camera_rangesense = np.asarray(T_camera_rangesense)
        self.pose_data = pose_data
        self.params = params
        self._jitted = None

    def _build(self, n_points: int):
        K = jnp.asarray(self.camera.K, jnp.float32)
        W, H = self.camera.width, self.camera.height
        T_cr = jnp.asarray(self.T_camera_rangesense, jnp.float32)
        zn = self.params.z_near
        rmax = self.params.max_range

        def fn(points, valid, T_comp):
            """points (B, n, 3) in the rangesensor frame at cloud time;
            T_comp (B, 4, 4) motion compensation (pose at image time
            relative to pose at cloud time, in the camera frame chain);
            returns sparse depth images (B, H, W)."""
            pts_cam = se3.apply_T(T_comp @ T_cr, points)  # (B, n, 3)
            z = pts_cam[..., 2]
            u = K[0, 0] * pts_cam[..., 0] / jnp.maximum(z, 1e-6) + K[0, 2]
            v = K[1, 1] * pts_cam[..., 1] / jnp.maximum(z, 1e-6) + K[1, 2]
            ok = valid & (z > zn) & (z < rmax) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
            flat = vi * W + ui

            def render(flat_b, z_b, ok_b):
                # z-buffer via scatter-min: big where invalid
                depth = jnp.full((H * W,), jnp.inf, jnp.float32)
                zb = jnp.where(ok_b, z_b, jnp.inf)
                depth = depth.at[flat_b].min(zb, mode="drop")
                depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
                return depth.reshape(H, W)

            return jax.vmap(render)(flat, z, ok)

        return jax.jit(fn)

    def compensation_transform(self, t_cloud: float, t_img: float) -> np.ndarray:
        """T that moves cloud-time camera points to image-time camera frame
        via interpolated body poses (reference :59-97)."""
        assert self.pose_data is not None
        T_w_img = self.pose_data.pose(t_img)
        T_w_cld = self.pose_data.pose(t_cloud)
        return np.linalg.inv(T_w_img) @ T_w_cld

    def depth_images(self, points: np.ndarray, valid: np.ndarray,
                     t_clouds, t_imgs) -> np.ndarray:
        """Batch: points (B, n, 3), valid (B, n); returns (B, H, W) sparse
        depth (0 where no return)."""
        B, n, _ = points.shape
        if self._jitted is None:
            self._jitted = self._build(n)
        T_comp = np.stack([
            self.compensation_transform(tc, ti) for tc, ti in zip(t_clouds, t_imgs)
        ]) if self.pose_data is not None else np.tile(np.eye(4), (B, 1, 1))
        return np.asarray(self._jitted(
            jnp.asarray(points, jnp.float32), jnp.asarray(valid),
            jnp.asarray(T_comp, jnp.float32)))
