"""Numpy twins of roman_tpu.ops.se3 for HOST-side glue code.

The TPU in this deployment sits behind a tunnel where every device->host
fetch costs ~1s of latency regardless of size, so host-side bookkeeping
(submap poses, g2o text conversion, pose interpolation) must never touch
jax for 4x4-sized math. Batched device code keeps using roman_tpu.ops.se3.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation as Rot


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    return Rot.from_quat(np.asarray(q).reshape(-1, 4)).as_matrix().reshape(
        np.shape(q)[:-1] + (3, 3)
    )


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    R = np.asarray(R)
    return Rot.from_matrix(R.reshape(-1, 3, 3)).as_quat().reshape(R.shape[:-2] + (4,))


def make_T(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    R = np.asarray(R)
    t = np.asarray(t)
    batch = R.shape[:-2]
    T = np.zeros(batch + (4, 4))
    T[..., :3, :3] = R
    T[..., :3, 3] = t
    T[..., 3, 3] = 1.0
    return T


def xyz_quat_to_T(t: np.ndarray, q: np.ndarray) -> np.ndarray:
    return make_T(quat_to_rot(q), t)


def T_to_xyz_quat(T: np.ndarray):
    T = np.asarray(T)
    return T[..., :3, 3], rot_to_quat(T[..., :3, :3])


def inv_T(T: np.ndarray) -> np.ndarray:
    T = np.asarray(T)
    Rt = np.swapaxes(T[..., :3, :3], -1, -2)
    return make_T(Rt, -np.einsum("...ij,...j->...i", Rt, T[..., :3, 3]))


def transform_rm_roll_pitch(T: np.ndarray) -> np.ndarray:
    """Yaw-only projection (reference roman/utils.py:128-130), batched."""
    T = np.asarray(T)
    R = T[..., :3, :3]
    yaw = np.arctan2(R[..., 1, 0], R[..., 0, 0])
    c, s = np.cos(yaw), np.sin(yaw)
    Rz = np.zeros(T.shape[:-2] + (3, 3))
    Rz[..., 0, 0] = c
    Rz[..., 0, 1] = -s
    Rz[..., 1, 0] = s
    Rz[..., 1, 1] = c
    Rz[..., 2, 2] = 1.0
    return make_T(Rz, T[..., :3, 3])


def T_to_xyzrpy(T: np.ndarray) -> np.ndarray:
    T = np.asarray(T)
    R = T[..., :3, :3]
    yaw = np.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = np.arcsin(np.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = np.arctan2(R[..., 2, 1], R[..., 2, 2])
    return np.concatenate(
        [T[..., :3, 3], np.stack([roll, pitch, yaw], axis=-1)], axis=-1
    )


def rotation_magnitude(R: np.ndarray) -> np.ndarray:
    R = np.asarray(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return np.arccos(np.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def _skew(w: np.ndarray) -> np.ndarray:
    K = np.zeros(w.shape[:-1] + (3, 3))
    K[..., 0, 1] = -w[..., 2]
    K[..., 0, 2] = w[..., 1]
    K[..., 1, 0] = w[..., 2]
    K[..., 1, 2] = -w[..., 0]
    K[..., 2, 0] = -w[..., 1]
    K[..., 2, 1] = w[..., 0]
    return K


def se3_log(T: np.ndarray) -> np.ndarray:
    """(...,4,4) -> (...,6) [rho, w], fully vectorized."""
    T = np.asarray(T)
    shape = T.shape[:-2]
    Tf = T.reshape(-1, 4, 4)
    w = Rot.from_matrix(Tf[:, :3, :3]).as_rotvec()
    th = np.linalg.norm(w, axis=-1)
    K = _skew(w)
    K2 = np.einsum("nij,njk->nik", K, K)
    small = th < 1e-4
    th_s = np.where(small, 1.0, th)
    coef = np.where(
        small,
        1.0 / 12.0,
        (1 - th_s * np.sin(th_s) / (2 * (1 - np.cos(th_s)))) / th_s**2,
    )
    Vinv = np.eye(3) - 0.5 * K + coef[:, None, None] * K2
    rho = np.einsum("nij,nj->ni", Vinv, Tf[:, :3, 3])
    return np.concatenate([rho, w], axis=-1).reshape(shape + (6,))


def interp_T(T0: np.ndarray, T1: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Pose interpolation: lerp translation + slerp rotation (scipy)."""
    T0 = np.atleast_3d(np.asarray(T0)).reshape(-1, 4, 4)
    T1 = np.atleast_3d(np.asarray(T1)).reshape(-1, 4, 4)
    a = np.asarray(alpha).reshape(-1)
    q0 = Rot.from_matrix(T0[:, :3, :3]).as_quat()
    q1 = Rot.from_matrix(T1[:, :3, :3]).as_quat()
    dot = np.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = np.where(dot < 0, -q1, q1)
    dot = np.clip(np.abs(dot), -1.0, 1.0)
    theta = np.arccos(dot)
    sin_t = np.sin(theta)
    small = sin_t[:, 0] < 1e-6
    w0 = np.where(small[:, None], 1 - a[:, None], np.sin((1 - a[:, None]) * theta) / np.maximum(sin_t, 1e-12))
    w1 = np.where(small[:, None], a[:, None], np.sin(a[:, None] * theta) / np.maximum(sin_t, 1e-12))
    q = w0 * q0 + w1 * q1
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = (1 - a[:, None]) * T0[:, :3, 3] + a[:, None] * T1[:, :3, 3]
    return make_T(Rot.from_quat(q).as_matrix(), t)


def arun_np(pts1: np.ndarray, pts2: np.ndarray,
            weights: np.ndarray | None = None) -> np.ndarray:
    """Weighted Arun/Umeyama SVD alignment (host numpy): the 4x4 T with
    pts1 ~= R @ pts2 + t, reflection-corrected. Reference semantics:
    object_registration.py:88-129."""
    pts1 = np.asarray(pts1, float).reshape(-1, 3)
    pts2 = np.asarray(pts2, float).reshape(-1, 3)
    w = (np.ones(len(pts1)) if weights is None
         else np.asarray(weights, float).reshape(-1))
    wsum = max(w.sum(), 1e-12)
    m1 = (pts1 * w[:, None]).sum(0) / wsum
    m2 = (pts2 * w[:, None]).sum(0) / wsum
    H = (pts1 - m1).T @ ((pts2 - m2) * w[:, None])
    U, _, Vh = np.linalg.svd(H)
    R = U @ Vh
    if np.linalg.det(R) < 0:
        Vh = Vh.copy()
        Vh[-1, :] *= -1.0
        R = U @ Vh
    return make_T(R, m1 - R @ m2)


def umeyama_np(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Numpy twin of ops.arun.umeyama_alignment for HOST-side ATE glue
    (a device round trip through the tunnel costs ~1 s for this 3x3
    SVD). Returns (R, t, s) with dst ~= s R src + t."""
    src = np.asarray(src, float)
    dst = np.asarray(dst, float)
    n = len(src)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = (dc.T @ sc) / n
    U, D, Vh = np.linalg.svd(cov)
    S = np.ones(3)
    S[2] = np.sign(np.linalg.det(U) * np.linalg.det(Vh))
    R = (U * S[None, :]) @ Vh
    if with_scale:
        var_s = np.mean(np.sum(sc**2, axis=1))
        s = float(np.sum(D * S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * (R @ mu_s)
    return R, t, s
