import jax.numpy as jnp
import numpy as np
import pytest

from mulls_tpu.core import se3


def _rand_euler(rng, scale=0.5):
    return jnp.asarray(rng.uniform(-scale, scale, 3), jnp.float32)


def test_euler_to_rotation_orthonormal(rng):
    for _ in range(5):
        R = np.asarray(se3.euler_to_rotation(_rand_euler(rng, 2.0)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_euler_convention_matches_rz_ry_rx(rng):
    """construct_trans_a parity: R = Rz(yaw) Ry(pitch) Rx(roll)."""
    e = _rand_euler(rng, 1.0)
    a, b, g = np.asarray(e)
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    Rz = np.array([[np.cos(g), -np.sin(g), 0], [np.sin(g), np.cos(g), 0], [0, 0, 1]])
    np.testing.assert_allclose(np.asarray(se3.euler_to_rotation(e)),
                               Rz @ Ry @ Rx, atol=1e-5)


def test_inverse_and_transform(rng):
    T = se3.make_transform(jnp.asarray(rng.uniform(-5, 5, 3), jnp.float32),
                           _rand_euler(rng))
    Ti = se3.inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-4)
    pts = jnp.asarray(rng.uniform(-10, 10, (100, 3)), jnp.float32)
    back = se3.transform_points(Ti, se3.transform_points(T, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=2e-3)


def test_rotation_angle(rng):
    e = jnp.asarray([0.0, 0.0, 0.3], jnp.float32)
    R = se3.euler_to_rotation(e)
    assert float(se3.rotation_angle(R)) == pytest.approx(0.3, abs=1e-5)


def test_quat_roundtrip(rng):
    for _ in range(5):
        R = se3.euler_to_rotation(_rand_euler(rng, 2.0))
        q = se3.quat_from_rotation(R)
        np.testing.assert_allclose(np.asarray(se3.rotation_from_quat(q)),
                                   np.asarray(R), atol=1e-5)
        assert float(jnp.linalg.norm(q)) == pytest.approx(1.0, abs=1e-5)


def test_quat_euler_jacobi_finite_difference(rng):
    """Analytic Jacobian (reference parity) vs finite differences of the
    imaginary quaternion part."""
    e0 = np.asarray(_rand_euler(rng, 0.8), np.float64)

    def imag_quat(e):
        R = se3.euler_to_rotation(jnp.asarray(e, jnp.float32))
        return np.asarray(se3.quat_from_rotation(R))[1:]

    J = np.asarray(se3.quat_euler_jacobi(jnp.asarray(e0, jnp.float32)))
    eps = 1e-4
    J_fd = np.zeros((3, 3))
    for k in range(3):
        ep, em = e0.copy(), e0.copy()
        ep[k] += eps
        em[k] -= eps
        J_fd[:, k] = (imag_quat(ep) - imag_quat(em)) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, atol=5e-3)


def test_so3_exp_small_and_large():
    w = jnp.asarray([1e-9, 0, 0], jnp.float32)
    np.testing.assert_allclose(np.asarray(se3.so3_exp(w)), np.eye(3), atol=1e-6)
    w = jnp.asarray([0, 0, np.pi / 2], jnp.float32)
    R = np.asarray(se3.so3_exp(w))
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-5)


def test_orthonormalize(rng):
    R = np.asarray(se3.euler_to_rotation(_rand_euler(rng, 1.0)))
    noisy = jnp.asarray(R + rng.normal(0, 1e-3, (3, 3)), jnp.float32)
    Ro = np.asarray(se3.orthonormalize(noisy))
    np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(Ro, R, atol=5e-3)
