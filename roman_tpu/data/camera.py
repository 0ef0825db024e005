"""Pinhole camera model + batched (de)projection.

Standalone replacement for robotdatapy's CameraParams / xyz_2_pixel /
pixel_depth_2_xyz used throughout the reference (segment.py:338-394,
fastsam_wrapper.py:340-362). Batched jnp versions so whole frames / point
pools project in one op.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CameraParams:
    K: np.ndarray          # (3, 3) intrinsics
    width: int
    height: int
    D: np.ndarray | None = None  # distortion (unused: rectified inputs)

    @property
    def fx(self):
        return float(self.K[0, 0])

    @property
    def fy(self):
        return float(self.K[1, 1])

    @property
    def cx(self):
        return float(self.K[0, 2])

    @property
    def cy(self):
        return float(self.K[1, 2])

    @classmethod
    def simple(cls, width=640, height=480, f=500.0):
        K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
        return cls(K=K, width=width, height=height)

    @classmethod
    def from_bag(cls, path: str, topic: str) -> "CameraParams":
        """Intrinsics from a sensor_msgs/CameraInfo topic in a ROS1 bag
        (reference pulls CameraParams.from_bag via robotdatapy,
        data_params.py:242-249)."""
        from roman_tpu.data import rosbag

        info = rosbag.read_camera_info(path, topic)
        return cls(K=np.asarray(info["K"], np.float64).reshape(3, 3),
                   width=int(info["width"]), height=int(info["height"]),
                   D=np.asarray(info["D"], np.float64))


def xyz_to_pixel(points: jax.Array, K: jax.Array) -> jax.Array:
    """(..., n, 3) camera-frame points -> (..., n, 2) [u, v] pixels."""
    z = jnp.maximum(points[..., 2], 1e-9)
    u = K[0, 0] * points[..., 0] / z + K[0, 2]
    v = K[1, 1] * points[..., 1] / z + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def pixel_depth_to_xyz(u: jax.Array, v: jax.Array, depth: jax.Array, K) -> jax.Array:
    """Pixels + depth -> camera-frame xyz (..., 3)."""
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    return jnp.stack([x, y, depth], axis=-1)


def depth_image_to_points(depth: jax.Array, K) -> jax.Array:
    """(H, W) depth image -> (H, W, 3) camera-frame points (z forward).

    Batched equivalent of o3d create_from_depth_image + mask indexing
    (fastsam_wrapper.py:340-362): compute the full point image once per
    frame, then every mask just gathers from it.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    return pixel_depth_to_xyz(u, v, depth, K)
