import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_tpu.ops import se3


def random_rotvec(key, scale=1.0, n=()):
    return scale * jax.random.normal(key, n + (3,))


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    w = random_rotvec(key, scale=1.0, n=(64,))
    # keep |w| < pi: beyond that the log returns the wrapped representative
    w = w * (0.9 * jnp.pi / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 0.9 * jnp.pi))
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_so3_exp_orthonormal():
    key = jax.random.PRNGKey(1)
    w = random_rotvec(key, scale=2.0, n=(32,))
    R = se3.so3_exp(w)
    eye = jnp.eye(3)
    err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye))
    assert float(err) < 1e-5
    dets = jnp.linalg.det(R)
    np.testing.assert_allclose(np.asarray(dets), 1.0, atol=1e-5)


def test_so3_log_small_and_pi():
    # tiny angle
    w = jnp.array([1e-7, -2e-7, 3e-7])
    np.testing.assert_allclose(
        np.asarray(se3.so3_log(se3.so3_exp(w))), np.asarray(w), atol=1e-9
    )
    # near pi
    axis = jnp.array([1.0, 2.0, -0.5])
    axis = axis / jnp.linalg.norm(axis)
    w = axis * (np.pi - 1e-4)
    w2 = se3.so3_log(se3.so3_exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-2)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    xi = jax.random.normal(key, (64, 6)) * 0.8  # keep rotation below pi
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_inverse_compose():
    key = jax.random.PRNGKey(3)
    xi = jax.random.normal(key, (16, 6))
    T = se3.se3_exp(xi)
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(
        np.asarray(I), np.broadcast_to(np.eye(4), I.shape), atol=1e-5
    )


def test_between_matches_definition():
    key = jax.random.PRNGKey(4)
    xa, xb = jax.random.normal(key, (2, 6))
    A, B = se3.se3_exp(xa), se3.se3_exp(xb)
    np.testing.assert_allclose(
        np.asarray(se3.between(A, B)),
        np.asarray(se3.inverse(A) @ B),
        atol=1e-6,
    )


def test_transform_points():
    key = jax.random.PRNGKey(5)
    xi = jax.random.normal(key, (6,))
    T = se3.se3_exp(xi)
    pts = jax.random.normal(jax.random.PRNGKey(6), (10, 3))
    out = se3.transform_points(T, pts)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_retract_local_inverse():
    key = jax.random.PRNGKey(7)
    xi0, dxi = jax.random.normal(key, (2, 6)) * 0.5
    T0 = se3.se3_exp(xi0)
    T1 = se3.retract(T0, dxi)
    np.testing.assert_allclose(np.asarray(se3.local(T0, T1)), np.asarray(dxi), atol=1e-4)


def test_rotation_angle_deg():
    axis = jnp.array([0.0, 1.0, 0.0])
    R = se3.so3_exp(axis * jnp.deg2rad(17.0))
    assert abs(float(se3.rotation_angle_deg(R)) - 17.0) < 1e-3


def test_ypr_yaw_only():
    R = se3.so3_exp(jnp.array([0.0, 0.0, 0.3]))
    ypr = se3.rotation_ypr(R)
    np.testing.assert_allclose(np.asarray(ypr), [0.3, 0.0, 0.0], atol=1e-6)
