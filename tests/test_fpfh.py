"""FPFH descriptor + SAC-IA coarse registration
(`cregistration.hpp:351-408` parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulls_tpu.backend.fpfh import compute_fpfh, coarse_reg_fpfhsac


def _synthetic_scene(rng, n=512):
    """Structured scene with analytic normals: ground + 2 walls + corner."""
    n_g = n // 2
    g_xyz = np.stack([rng.uniform(-10, 10, n_g), rng.uniform(-10, 10, n_g),
                      np.zeros(n_g)], -1)
    g_nrm = np.tile([0.0, 0.0, 1.0], (n_g, 1))
    n_w = n // 4
    w1_xyz = np.stack([np.full(n_w, 8.0), rng.uniform(-10, 10, n_w),
                       rng.uniform(0, 4, n_w)], -1)
    w1_nrm = np.tile([1.0, 0.0, 0.0], (n_w, 1))
    n_w2 = n - n_g - n_w
    w2_xyz = np.stack([rng.uniform(-10, 10, n_w2), np.full(n_w2, -6.0),
                       rng.uniform(0, 4, n_w2)], -1)
    w2_nrm = np.tile([0.0, 1.0, 0.0], (n_w2, 1))
    xyz = np.concatenate([g_xyz, w1_xyz, w2_xyz]).astype(np.float32)
    nrm = np.concatenate([g_nrm, w1_nrm, w2_nrm]).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(nrm)


def _rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_fpfh_rotation_invariance():
    rng = np.random.default_rng(0)
    xyz, nrm = _synthetic_scene(rng)
    mask = jnp.ones(xyz.shape[0], bool)
    f0 = np.asarray(compute_fpfh(xyz, nrm, mask, 2.0))
    R = jnp.asarray(_rot(0.7))
    f1 = np.asarray(compute_fpfh(xyz @ R.T, nrm @ R.T, mask, 2.0))
    # descriptors are pose-invariant: same per-point histograms
    err = np.abs(f0 - f1).max()
    assert err < 1e-2, err
    # blocks are percentage-normalized
    blocks = f0.reshape(-1, 3, 11).sum(-1)
    assert np.allclose(blocks, 100.0, atol=1e-3)
    # masked rows are zero
    mask2 = mask.at[:10].set(False)
    f2 = np.asarray(compute_fpfh(xyz, nrm, mask2, 2.0))
    assert np.all(f2[:10] == 0.0)


def test_fpfh_distinguishes_geometry():
    rng = np.random.default_rng(1)
    xyz, nrm = _synthetic_scene(rng)
    mask = jnp.ones(xyz.shape[0], bool)
    f = np.asarray(compute_fpfh(xyz, nrm, mask, 2.0))
    pts = np.asarray(xyz)
    # plane-interior point: far from both walls -> all pair angles are
    # "straight", a single-bin histogram per block
    interior = np.argmax(np.minimum(8.0 - pts[:, 0], pts[:, 1] + 6.0)
                         * (pts[:, 2] == 0.0))
    assert f[interior].max() > 95.0
    # edge point at the wall base sees two normal populations -> spread
    base = np.argmin(np.abs(pts[:, 0] - 8.0) + np.abs(pts[:, 2]))
    d_edge = np.abs(f[interior] - f[base]).sum()
    # two different plane interiors are nearly indistinguishable
    # (pose invariance) while plane-vs-edge is far apart
    wall_int = np.argmax(pts[:, 2] * (pts[:, 0] == 8.0))
    d_planes = np.abs(f[interior] - f[wall_int]).sum()
    assert d_edge > 3.0 * max(d_planes, 1.0)


def test_coarse_reg_fpfhsac_recovers_transform():
    rng = np.random.default_rng(2)
    xyz, nrm = _synthetic_scene(rng)
    mask = jnp.ones(xyz.shape[0], bool)
    yaw = 0.35
    R = _rot(yaw)
    t = np.array([2.0, -1.5, 0.3], np.float32)
    src = (np.asarray(xyz) @ R.T + t).astype(np.float32)
    src_n = (np.asarray(nrm) @ R.T).astype(np.float32)
    # register src -> tgt: ground truth is the inverse of (R, t)
    res, fitness = coarse_reg_fpfhsac(
        jnp.asarray(src), jnp.asarray(src_n), mask,
        xyz, nrm, mask, jax.random.PRNGKey(0), search_radius=1.0,
        inlier_thre=0.5)
    T = np.asarray(res.transform)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.T
    T_gt[:3, 3] = -R.T @ t
    assert bool(res.valid)
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.3, T
    cos = (np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1.0) / 2.0
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 3.0
    assert float(fitness) < 0.1
