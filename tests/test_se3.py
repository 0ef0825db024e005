import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from roman_tpu.ops import se3


def random_T(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = Rot.from_quat(q.reshape(-1, 4)).as_matrix().reshape(n + (3, 3))
    t = rng.normal(size=n + (3,)) * 5
    T = np.zeros(n + (4, 4))
    T[..., :3, :3] = R
    T[..., :3, 3] = t
    T[..., 3, 3] = 1
    return T


def test_quat_rot_roundtrip(rng):
    q = rng.normal(size=(50, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R_ref = Rot.from_quat(q).as_matrix()
    R = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
    np.testing.assert_allclose(R, R_ref, atol=1e-6)
    q2 = np.asarray(se3.rot_to_quat(jnp.asarray(R_ref)))
    # same rotation up to sign
    dots = np.abs(np.sum(q2 * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)


def test_inv_apply(rng):
    T = random_T(rng, (10,))
    Ti = np.asarray(se3.inv_T(jnp.asarray(T)))
    np.testing.assert_allclose(Ti @ T, np.broadcast_to(np.eye(4), (10, 4, 4)), atol=1e-6)
    pts = rng.normal(size=(10, 7, 3))
    out = np.asarray(se3.apply_T(jnp.asarray(T), jnp.asarray(pts)))
    ref = np.einsum("bij,bnj->bni", T[:, :3, :3], pts) + T[:, None, :3, 3]
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_rm_roll_pitch_matches_scipy(rng):
    T = random_T(rng, (20,))
    got = np.asarray(se3.transform_rm_roll_pitch(jnp.asarray(T)))
    for i in range(20):
        yaw_ref = Rot.from_matrix(T[i, :3, :3]).as_euler("ZYX")[0]
        R_ref = Rot.from_euler("z", yaw_ref).as_matrix()
        np.testing.assert_allclose(got[i, :3, :3], R_ref, atol=1e-6)
        np.testing.assert_allclose(got[i, :3, 3], T[i, :3, 3], atol=1e-6)


def test_xyzrpy_matches_scipy(rng):
    T = random_T(rng, (20,))
    got = np.asarray(se3.T_to_xyzrpy(jnp.asarray(T)))
    for i in range(20):
        ypr = Rot.from_matrix(T[i, :3, :3]).as_euler("ZYX")
        np.testing.assert_allclose(got[i, 3:], ypr[::-1], atol=1e-6)


def test_rotation_magnitude(rng):
    T = random_T(rng, (20,))
    got = np.asarray(se3.rotation_magnitude(jnp.asarray(T[..., :3, :3])))
    ref = Rot.from_matrix(T[:, :3, :3]).magnitude()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(30, 6))
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    xi2 = np.asarray(se3.se3_log(jnp.asarray(T)))
    np.testing.assert_allclose(xi2, xi, atol=1e-5)
    # tiny rotations
    xi_small = rng.normal(size=(5, 6)) * 1e-7
    T = np.asarray(se3.se3_exp(jnp.asarray(xi_small)))
    xi2 = np.asarray(se3.se3_log(jnp.asarray(T)))
    np.testing.assert_allclose(xi2, xi_small, atol=1e-9)


def test_interp(rng):
    T0 = random_T(rng, (5,))
    T1 = random_T(rng, (5,))
    mid = np.asarray(se3.interp_T(jnp.asarray(T0), jnp.asarray(T1), jnp.full((5,), 0.0)))
    np.testing.assert_allclose(mid, T0, atol=1e-6)
    mid = np.asarray(se3.interp_T(jnp.asarray(T0), jnp.asarray(T1), jnp.full((5,), 1.0)))
    np.testing.assert_allclose(mid, T1, atol=1e-6)
