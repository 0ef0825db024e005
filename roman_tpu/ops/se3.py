"""Batched SO(3)/SE(3) operations in JAX.

TPU-native equivalent of the scattered scipy.spatial.transform /
robotdatapy.transform usage in the reference (e.g. reference
roman/utils.py:125-130 ``transform_rm_roll_pitch``, robotdatapy's
``transform_to_xyz_quat`` used by roman/align/results.py:172). Everything
here broadcasts over arbitrary leading batch dimensions and is jit/vmap
safe (no data-dependent control flow).

Quaternion convention: xyzw (scalar last), matching scipy/the reference's
g2o output format (EDGE_SE3:QUAT x y z qx qy qz qw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Quaternions <-> rotation matrices
# ---------------------------------------------------------------------------

def quat_to_rot(q: jax.Array) -> jax.Array:
    """xyzw quaternion(s) (..., 4) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> xyzw quaternion (..., 4).

    Branch-free (Shepperd's method evaluated on all four candidates and the
    numerically best one selected) so it vmaps/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate (unnormalized) quaternions, one per dominant component
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    # candidates as wxyz rows
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4comp[w,x,y,z])
    # dominant diagonal term per candidate
    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # wxyz -> xyzw, canonicalize sign (w >= 0)
    q = jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SE(3) assembly / application
# ---------------------------------------------------------------------------

def make_T(R: jax.Array, t: jax.Array) -> jax.Array:
    """(...,3,3) + (...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def xyz_quat_to_T(t: jax.Array, q: jax.Array) -> jax.Array:
    return make_T(quat_to_rot(q), t)


def T_to_xyz_quat(T: jax.Array):
    """(...,4,4) -> ((...,3), (...,4) xyzw). Mirror of robotdatapy
    transform_to_xyz_quat used at reference roman/align/results.py:172."""
    return T[..., :3, 3], rot_to_quat(T[..., :3, :3])


def inv_T(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def apply_T(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (...,4,4) to points (...,n,3)."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], points) + T[..., None, :3, 3]


# ---------------------------------------------------------------------------
# Euler / yaw helpers
# ---------------------------------------------------------------------------

def yaw_of_rot(R: jax.Array) -> jax.Array:
    """Z angle of the ZYX euler decomposition (first rotation applied last),
    i.e. scipy Rot.as_euler('ZYX')[0] == atan2(R10, R00)."""
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])


def rot_z(yaw: jax.Array) -> jax.Array:
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack(
        [c, -s, z, s, c, z, z, z, o], axis=-1
    ).reshape(yaw.shape + (3, 3))


def rotation_rm_roll_pitch(R: jax.Array) -> jax.Array:
    """Project rotation onto yaw-only. Reference roman/utils.py:125-127."""
    return rot_z(yaw_of_rot(R))


def transform_rm_roll_pitch(T: jax.Array) -> jax.Array:
    """Yaw-only projection of an SE(3). Reference roman/utils.py:128-130.
    (Functional: returns a new matrix instead of mutating.)"""
    return make_T(rotation_rm_roll_pitch(T[..., :3, :3]), T[..., :3, 3])


def T_to_xyzrpy(T: jax.Array) -> jax.Array:
    """(...,4,4) -> (...,6) [x y z roll pitch yaw] with 'ZYX' intrinsic euler
    (scipy convention used by robotdatapy.transform_to_xyzrpy; reference
    submap_align.py:128 takes [5]==yaw... note robotdatapy returns rpy order
    roll(x), pitch(y), yaw(z))."""
    R = T[..., :3, :3]
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.concatenate(
        [T[..., :3, 3], jnp.stack([roll, pitch, yaw], axis=-1)], axis=-1
    )


def rotation_magnitude(R: jax.Array) -> jax.Array:
    """Geodesic angle of rotation matrices (scipy Rotation.magnitude)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log (used by the rpgo Gauss-Newton solver)
# ---------------------------------------------------------------------------

def skew(w: jax.Array) -> jax.Array:
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))


def _safe_norm(x, axis=-1, keepdims=True, eps=_EPS):
    """Norm whose gradient is finite at 0 (sqrt'(0) is inf otherwise)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues with Taylor fallback near 0.

    The exact branch uses `small`-guarded ("safe") denominators so that
    jax.grad/jacfwd through the unselected branch never sees 0/0 — the
    standard double-where idiom (the rpgo solver differentiates this).
    """
    theta = _safe_norm(w)[..., None]  # (...,1,1)
    K = skew(w)
    K2 = K @ K
    small = theta < 1e-2
    theta_s = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(theta_s) / theta_s)
    b = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta_s)) / theta_s**2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Inverse Rodrigues; accurate away from pi (fine for residuals).
    Safe-branch denominators for autodiff (see so3_exp)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)[..., None, None]
    W = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    small = theta < 1e-2
    theta_s = jnp.where(small, 1.0, theta)
    scale = jnp.where(small, 1.0 + theta**2 / 6.0, theta_s / jnp.sin(theta_s))
    V = scale * W
    return jnp.stack([V[..., 2, 1], V[..., 0, 2], V[..., 1, 0]], axis=-1)


def se3_exp(xi: jax.Array) -> jax.Array:
    """xi = (...,6) [rho(3), w(3)] -> (...,4,4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta = _safe_norm(w)[..., None]
    K = skew(w)
    K2 = K @ K
    small = theta < 1e-2
    theta_s = jnp.where(small, 1.0, theta)
    b = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta_s)) / theta_s**2)
    c = jnp.where(small, 1.0 / 6.0 - theta**2 / 120.0, (theta_s - jnp.sin(theta_s)) / theta_s**3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * K2
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make_T(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    w = so3_log(T[..., :3, :3])
    theta = _safe_norm(w)[..., None]
    K = skew(w)
    K2 = K @ K
    small = theta < 1e-2
    theta_s = jnp.where(small, 1.0, theta)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta**2 / 720.0,
        (1.0 - theta_s * jnp.sin(theta_s) / (2.0 * (1.0 - jnp.cos(theta_s))))
        / theta_s**2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([rho, w], axis=-1)


# ---------------------------------------------------------------------------
# Interpolation (pose data support; robotdatapy-equivalent)
# ---------------------------------------------------------------------------

def slerp(q0: jax.Array, q1: jax.Array, alpha: jax.Array) -> jax.Array:
    """Spherical interpolation of xyzw quaternions, branch-free."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-6
    a = jnp.where(use_lerp, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.maximum(sin_theta, _EPS))
    b = jnp.where(use_lerp, alpha, jnp.sin(alpha * theta) / jnp.maximum(sin_theta, _EPS))
    q = a * q0 + b * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def interp_T(T0: jax.Array, T1: jax.Array, alpha: jax.Array) -> jax.Array:
    """Pose interpolation: lerp translation + slerp rotation."""
    q = slerp(rot_to_quat(T0[..., :3, :3]), rot_to_quat(T1[..., :3, :3]), alpha[..., None])
    t = (1.0 - alpha[..., None]) * T0[..., :3, 3] + alpha[..., None] * T1[..., :3, 3]
    return make_T(quat_to_rot(q), t)
