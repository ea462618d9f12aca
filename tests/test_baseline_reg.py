"""NDT / VGICP baseline registration (parity with the reference's
`baseline_reg/` vendored OpenMP baselines, `ndt_omp.h`, `fast_vgicp.h`)."""

import numpy as np
import jax
import jax.numpy as jnp

from mulls_tpu.core import se3
from mulls_tpu.ops import baseline_reg as br


def _world(rng, n=6000):
    """Structured scene: ground + 2 walls + posts (full 6-DoF constraint)."""
    n_g = n // 2
    g = np.stack([rng.uniform(-30, 30, n_g), rng.uniform(-30, 30, n_g),
                  0.03 * rng.normal(size=n_g)], -1)
    n_w = n // 3
    w1 = np.stack([np.full(n_w // 2, 12.0) + 0.03 * rng.normal(size=n_w // 2),
                   rng.uniform(-20, 20, n_w // 2),
                   rng.uniform(0, 4, n_w // 2)], -1)
    w2 = np.stack([rng.uniform(-20, 20, n_w - n_w // 2),
                   np.full(n_w - n_w // 2, -8.0)
                   + 0.03 * rng.normal(size=n_w - n_w // 2),
                   rng.uniform(0, 4, n_w - n_w // 2)], -1)
    n_p = n - n_g - n_w
    cx = rng.uniform(-25, 25, 20)
    cy = rng.uniform(-25, 25, 20)
    k = rng.integers(0, 20, n_p)
    p = np.stack([cx[k] + 0.02 * rng.normal(size=n_p),
                  cy[k] + 0.02 * rng.normal(size=n_p),
                  rng.uniform(0, 5, n_p)], -1)
    return np.concatenate([g, w1, w2, p]).astype(np.float32)


def _true_T():
    ang = np.radians(2.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                 [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    T[:3, 3] = [0.6, -0.3, 0.05]
    return T


def _check(T_est, T_true, tol_t=0.08, tol_r_deg=0.5):
    dT = np.linalg.inv(T_true) @ T_est
    err_t = np.linalg.norm(dT[:3, 3])
    err_r = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2,
                                         -1, 1)))
    assert err_t < tol_t, f"translation error {err_t}"
    assert err_r < tol_r_deg, f"rotation error {err_r}"


def test_ndt_recovers_transform():
    rng = np.random.default_rng(7)
    tgt = _world(rng)
    T = _true_T()
    # source = target observed from the moved pose: p_src = T^-1 (p_tgt)
    src = (tgt - T[:3, 3]) @ T[:3, :3]
    mask = jnp.ones(len(tgt), bool)
    table = br.build_voxel_table(jnp.asarray(tgt), mask, resolution=1.5)
    res = br.ndt_register(jnp.asarray(src.astype(np.float32)), mask, table,
                          jnp.eye(4, dtype=jnp.float32))
    assert int(res.matched) > 1000
    _check(np.asarray(res.transform, np.float64), T)


def test_vgicp_recovers_transform():
    rng = np.random.default_rng(8)
    tgt = _world(rng)
    T = _true_T()
    src = ((tgt - T[:3, 3]) @ T[:3, :3]).astype(np.float32)
    mask = jnp.ones(len(tgt), bool)
    table = br.build_voxel_table(jnp.asarray(tgt), mask, resolution=1.0,
                                 mode="gicp", min_points=4)
    s_cov = br.point_covariances(jnp.asarray(src), mask, radius=1.0)
    res = br.vgicp_register(jnp.asarray(src), mask, s_cov, table,
                            jnp.eye(4, dtype=jnp.float32))
    assert int(res.matched) > 1000
    _check(np.asarray(res.transform, np.float64), T, tol_t=0.05,
           tol_r_deg=0.3)


def test_voxel_table_stats():
    rng = np.random.default_rng(9)
    pts = rng.normal(0, 0.1, (500, 3)).astype(np.float32) + [5.0, 5.0, 5.0]
    mask = jnp.ones(500, bool)
    table = br.build_voxel_table(jnp.asarray(pts), mask, resolution=4.0)
    slot = int(br._hash_ijk(jnp.floor(jnp.asarray([[5.0, 5.0, 5.0]]) / 4.0)
                            .astype(jnp.int32), 1 << 17)[0])
    assert float(table.count[slot]) == 500
    np.testing.assert_allclose(np.asarray(table.mean[slot]), pts.mean(0),
                               atol=1e-3)


def test_ndt_coarse_voxels_direct7_step_control(rng):
    """At 2 m voxels (the reference's robust operating range thanks to
    DIRECT7 + More-Thuente, `ndt_omp.h:51-72`) the DIRECT7 + step-control
    path must converge where the bare DIRECT1 fixed-step variant has no
    robustness guarantee."""
    world = _world(rng, n=8000)
    T_true = _true_T()
    src = (world - T_true[:3, 3]) @ T_true[:3, :3]  # inverse-transform
    src = src.astype(np.float32)
    mask = jnp.ones(len(src), bool)
    table = br.build_voxel_table(jnp.asarray(world), mask, resolution=2.0)
    res = br.ndt_register(jnp.asarray(src), mask, table,
                          jnp.eye(4, dtype=jnp.float32), max_iter=40,
                          direct7=True, step_control=True)
    _check(np.asarray(res.transform), T_true, tol_t=0.15, tol_r_deg=1.0)


def test_ndt_step_control_no_regression_fine_voxels(rng):
    """Step control must not hurt the fine-voxel case the round-1 test
    already covers."""
    world = _world(rng)
    T_true = _true_T()
    src = ((world - T_true[:3, 3]) @ T_true[:3, :3]).astype(np.float32)
    mask = jnp.ones(len(src), bool)
    table = br.build_voxel_table(jnp.asarray(world), mask, resolution=1.0)
    res = br.ndt_register(jnp.asarray(src), mask, table,
                          jnp.eye(4, dtype=jnp.float32), max_iter=40,
                          direct7=True, step_control=True)
    _check(np.asarray(res.transform), T_true)
