"""Coordinate transforms (`cregistration.hpp:2927-3384`) and the ICP
variants (3-DoF ground, 4-DoF yaw-search, `cregistration.hpp:1443-1681`)."""

import numpy as np
import jax.numpy as jnp

from mulls_tpu.core import coord_trans, se3


def _rot_z(deg):
    a = np.radians(deg)
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1]])


def test_coord_tran_4dof(rng):
    src = rng.uniform(-50, 50, (20, 3)).astype(np.float32)
    s, yaw, t = 1.02, 23.0, np.array([100.0, -40.0, 3.0])
    dst = src.copy()
    dst[:, :2] = s * (src[:, :2] @ _rot_z(yaw)[:2, :2].T) + t[:2]
    dst[:, 2] += t[2]
    T, s_est = coord_trans.coord_tran_4dof(jnp.asarray(src),
                                           jnp.asarray(dst.astype(np.float32)))
    out = src @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, dst, atol=1e-2)
    assert abs(float(s_est) - s) < 1e-3


def test_coord_tran_6dof_svd(rng):
    src = rng.uniform(-50, 50, (15, 3)).astype(np.float32)
    R = _rot_z(31.0) @ np.array([[1, 0, 0], [0, 0.9962, -0.0872],
                                 [0, 0.0872, 0.9962]])
    t = np.array([5.0, -2.0, 1.0])
    dst = (src @ R.T + t).astype(np.float32)
    T, s = coord_trans.coord_tran_6dof_svd(jnp.asarray(src),
                                           jnp.asarray(dst))
    out = src @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, dst, atol=1e-3)
    assert abs(float(s) - 1.0) < 1e-6


def test_coord_tran_7dof(rng):
    src = rng.uniform(-50, 50, (25, 3)).astype(np.float32)
    r = np.array([0.002, -0.001, 0.003])  # small angles
    R = np.eye(3) + np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]],
                              [-r[1], r[0], 0]])
    mu = 1.0005
    t = np.array([12.0, 7.0, -3.0])
    dst = (mu * (src @ R.T) + t).astype(np.float32)
    T, scale = coord_trans.coord_tran_7dof(jnp.asarray(src),
                                           jnp.asarray(dst))
    out = src @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(out, dst, atol=1e-2)
    assert abs(float(scale) - mu) < 1e-4


def _ground_cloud(rng, n=512, cap=512):
    from mulls_tpu.core.cloud import FeatureCloud
    xyz = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                    0.01 * rng.normal(size=n)], -1).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
    return FeatureCloud(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        strength=jnp.ones(n, jnp.float32),
        intensity=jnp.zeros(n, jnp.float32),
        height=jnp.zeros(n, jnp.float32),
        ts_ratio=jnp.zeros(n, jnp.float32),
        mask=jnp.ones(n, bool))


def test_ground_3dof_estimate(rng):
    from mulls_tpu.config import MullsConfig
    from mulls_tpu.frontend.icp import ground_3dof_estimate

    cfg = MullsConfig().reg
    tgt = _ground_cloud(rng)
    # source: ground shifted down by 0.3 and tilted by 1 deg roll
    a = np.radians(1.0)
    R = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                  [0, np.sin(a), np.cos(a)]], np.float32)
    src_xyz = np.asarray(tgt.xyz) @ R.T
    src_xyz[:, 2] -= 0.3
    src = tgt.replace(xyz=jnp.asarray(src_xyz),
                      normal=jnp.asarray(np.tile(R[:, 2], (512, 1))))
    res = ground_3dof_estimate(src, tgt, cfg,
                               jnp.eye(4, dtype=jnp.float32))
    T = np.asarray(res.transform)
    # z and roll recovered; x/y/yaw untouched
    assert abs(T[2, 3] - 0.3) < 0.05
    assert abs(T[0, 3]) < 1e-4 and abs(T[1, 3]) < 1e-4
    ang = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1)))
    assert abs(ang - 1.0) < 0.3
