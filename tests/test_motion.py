"""Motion compensation: azimuth timestamp model + slerp undistortion
(`cfilter.hpp:412-549` parity)."""

import numpy as np
import jax.numpy as jnp

from mulls_tpu.core import se3
from mulls_tpu.ops import motion


def test_azimuth_ratio_monotone_sweep():
    # points laid out clockwise starting at +x
    angles = -np.linspace(0, 1.9 * np.pi, 100)
    xyz = np.stack([np.cos(angles), np.sin(angles),
                    np.zeros_like(angles)], -1).astype(np.float32)
    mask = np.ones(100, bool)
    r = np.asarray(motion.timestamp_ratio_from_azimuth(
        jnp.asarray(xyz), jnp.asarray(mask)))
    assert r[0] == 0.0
    assert np.all(np.diff(r) > 0)
    assert r[-1] < 1.0


def test_undistort_identity_motion():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
    ts = rng.uniform(0, 1, 50).astype(np.float32)
    out = np.asarray(motion.undistort(jnp.asarray(xyz), jnp.asarray(ts),
                                      jnp.ones(50, bool),
                                      jnp.eye(4, dtype=jnp.float32)))
    np.testing.assert_allclose(out, xyz, atol=1e-5)


def test_undistort_endpoints_and_half():
    # T_rel: rotate 10 deg about z + translate [1, 0, 0]
    ang = np.radians(10.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                 [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    T[0, 3] = 1.0
    p = np.array([[5.0, 2.0, 1.0]], np.float32)

    # s=0 (start of frame): no correction
    out0 = np.asarray(motion.undistort(
        jnp.asarray(p), jnp.asarray([0.0], jnp.float32), jnp.ones(1, bool),
        jnp.asarray(T)))
    np.testing.assert_allclose(out0, p, atol=1e-5)

    # s=1 (end of frame): full T applied
    out1 = np.asarray(motion.undistort(
        jnp.asarray(p), jnp.asarray([1.0], jnp.float32), jnp.ones(1, bool),
        jnp.asarray(T)))
    expect = (T[:3, :3] @ p[0] + T[:3, 3])
    np.testing.assert_allclose(out1[0], expect, atol=1e-5)

    # s=0.5: half rotation + half translation
    outh = np.asarray(motion.undistort(
        jnp.asarray(p), jnp.asarray([0.5], jnp.float32), jnp.ones(1, bool),
        jnp.asarray(T)))
    half = np.radians(5.0)
    Rh = np.array([[np.cos(half), -np.sin(half), 0],
                   [np.sin(half), np.cos(half), 0], [0, 0, 1]])
    np.testing.assert_allclose(outh[0], Rh @ p[0] + [0.5, 0, 0], atol=1e-5)


def test_undistort_straightens_skewed_wall():
    """A straight wall scanned during pure forward motion appears skewed in
    the raw frame; undistortion with the true motion must straighten it."""
    n = 200
    ts = np.linspace(0, 1, n).astype(np.float32)
    wall_y = np.linspace(-5, 5, n).astype(np.float32)
    # true wall at x=10 in END-of-frame coords; scanner moves +x at 1 m/frame
    # point captured at time s sees the wall at x = 10 - (s-1)*v ... raw
    # coordinate = wall point in the frame at time s:
    v = 1.0
    raw_x = 10.0 - (ts - 1.0) * v  # at s=1: 10 (end frame), s=0: 11
    raw = np.stack([raw_x, wall_y, np.zeros(n, np.float32)], -1)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = v  # frame k pose in frame k-1: moved +x by v
    # remaining motion for point s is (1-s)*v applied... undistort into
    # end-of-frame coords: x should all become 10... our convention moves
    # points by T^(1-s); the raw x at time s is 10 + (1-s)v in the
    # *instantaneous* frame; undistorting into the START frame adds motion.
    out = np.asarray(motion.undistort(
        jnp.asarray(raw), jnp.asarray(ts), jnp.ones(n, bool), jnp.asarray(T)))
    # after compensation the wall must be flat (constant x)
    assert out[:, 0].std() < 0.02, out[:, 0].std()
