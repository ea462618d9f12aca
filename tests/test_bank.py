"""Device-resident submap bank (`backend/bank.py`): slot store/eval
equivalence with the host path, the batched loop-candidate ladder, and the
lazy `Submap` host materialization + checkpoint pickle compatibility."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulls_tpu.backend import bank as bk
from mulls_tpu.config import MullsConfig
from mulls_tpu.core.cloud import (FEATURE_NAMES, FeatureCloud,
                                  VertexDescriptors)
from mulls_tpu.frontend.icp import mm_lls_icp


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _cloud(xyz, normal, cap):
    n = xyz.shape[0]
    pad = cap - n
    xyz = np.concatenate([xyz, np.zeros((pad, 3))]).astype(np.float32)
    normal = np.concatenate([normal, np.zeros((pad, 3))]).astype(np.float32)
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return FeatureCloud(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(normal),
        intensity=jnp.full((cap,), 0.5, jnp.float32),
        strength=jnp.full((cap,), 0.8, jnp.float32),
        height=jnp.zeros((cap,), jnp.float32),
        ts_ratio=jnp.zeros((cap,), jnp.float32),
        mask=jnp.asarray(mask))


def _synth_submap(seed, T=np.eye(4), cap=192, n=128):
    """Structured world: ground plane + two orthogonal walls + pillars,
    optionally rigidly moved by T (clouds in 'submap-local' coords).
    Same seed = same world, so cross-submap NCC/ICP correspondences are
    real."""
    rng = np.random.default_rng(seed)
    R, t = T[:3, :3], T[:3, 3]

    def mv(p):
        return p @ R.T + t

    g = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                  rng.normal(0, 0.01, n)], -1)
    gn = np.tile([0.0, 0.0, 1.0], (n, 1))
    fx = np.stack([np.full(n, 8.0) + rng.normal(0, 0.01, n),
                   rng.uniform(-20, 20, n), rng.uniform(0, 6, n)], -1)
    fy = np.stack([rng.uniform(-20, 20, n),
                   np.full(n, -7.0) + rng.normal(0, 0.01, n),
                   rng.uniform(0, 6, n)], -1)
    f = np.concatenate([fx, fy])
    fn = np.concatenate([np.tile([1.0, 0, 0], (n, 1)),
                         np.tile([0, 1.0, 0], (n, 1))])
    nv = 24
    base = np.stack([rng.uniform(-15, 15, nv), rng.uniform(-15, 15, nv)],
                    -1)
    p = np.concatenate([np.stack([base[:, 0] + rng.normal(0, 0.01, nv),
                                  base[:, 1] + rng.normal(0, 0.01, nv),
                                  np.full(nv, z)], -1)
                        for z in np.linspace(0, 4, 16)])
    pn = np.tile([0.0, 0.0, 1.0], (p.shape[0], 1))  # direction vector
    v = np.concatenate([base, np.full((nv, 1), 4.0)], -1)  # pillar tops
    vn = np.tile([0.0, 0.0, 1.0], (nv, 1))

    clouds = {
        "ground": _cloud(mv(g), gn @ R.T, cap),
        "facade": _cloud(mv(f), fn @ R.T, 2 * cap),
        "pillar": _cloud(mv(p), pn @ R.T, 512),
        "beam": _cloud(np.zeros((0, 3)), np.zeros((0, 3)), 64),
        "roof": _cloud(np.zeros((0, 3)), np.zeros((0, 3)), 64),
        "vertex": _cloud(mv(v), vn @ R.T, 64),
    }
    assert set(clouds) == set(FEATURE_NAMES)
    # distinctive per-keypoint descriptors, shared across submaps so NCC
    # matches the true correspondences
    vec = np.zeros((64, 11), np.float32)
    vec[:nv] = np.asarray(rng.uniform(0, 60, (nv, 11)), np.float32)
    desc = VertexDescriptors(vec=jnp.asarray(vec),
                             mask=jnp.asarray(np.arange(64) < nv))
    return clouds, desc


def test_pair_m2m_matches_direct_icp(rng):
    cfg = MullsConfig()
    T_true = np.eye(4)
    T_true[:3, 3] = [0.4, -0.25, 0.05]
    a_cl, a_d = _synth_submap(7)
    b_cl, b_d = _synth_submap(7, T=np.linalg.inv(T_true))

    bank = bk.init_bank(a_cl, a_d, capacity=4)
    bank = bk.bank_store(bank, jnp.int32(0), a_cl, a_d)
    bank = bk.bank_store(bank, jnp.int32(1), b_cl, b_d)

    guess = jnp.eye(4, dtype=jnp.float32)
    row = np.asarray(bk.pair_m2m(bank, jnp.int32(0), jnp.int32(1), guess,
                                 cfg, cfg.reg.reg_max_iter_num_m2m))
    got = bk.unpack_reg(row)
    ref = mm_lls_icp(b_cl, a_cl, cfg.reg, guess,
                     max_iter=cfg.reg.reg_max_iter_num_m2m)
    assert got["code"] == int(ref.process_code) == 1
    np.testing.assert_allclose(got["T"], np.asarray(ref.transform),
                               atol=1e-5)
    np.testing.assert_allclose(got["T"][:3, 3], T_true[:3, 3], atol=0.05)
    np.testing.assert_allclose(got["info"], np.asarray(ref.information),
                               rtol=1e-4, atol=1e-2)


def test_local_bounds_matches_host(rng):
    a_cl, _ = _synth_submap(7)
    lb = np.asarray(bk.local_bounds(a_cl))
    pts = []
    for name in ("ground", "facade", "pillar"):
        c = a_cl[name]
        pts.append(np.asarray(c.xyz)[np.asarray(c.mask)])
    p = np.concatenate(pts)
    np.testing.assert_allclose(lb[:3], p.min(0), atol=1e-6)
    np.testing.assert_allclose(lb[3:], p.max(0), atol=1e-6)


def test_loop_eval_batch_ladder(rng):
    """Batched candidate ladder: candidate 0 runs with the coarse stage on
    (NCC + GNC should recover a translation the odometry guess is blind
    to), candidate 1 from the odometry guess only; both fine results must
    match the direct per-pair programs."""
    cfg = MullsConfig()
    T_true = np.eye(4)
    T_true[:3, 3] = [3.0, 1.5, 0.0]  # beyond corr_dis gates without coarse
    a_cl, a_d = _synth_submap(7)
    b_cl, b_d = _synth_submap(7, T=np.linalg.inv(T_true))

    bank = bk.init_bank(a_cl, a_d, capacity=4)
    bank = bk.bank_store(bank, jnp.int32(0), a_cl, a_d)
    bank = bk.bank_store(bank, jnp.int32(1), b_cl, b_d)

    K = 2
    old_idx = jnp.asarray([0, 0], jnp.int32)
    Tg = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))
    use_coarse = jnp.asarray([True, False])
    cm = jnp.broadcast_to(jnp.asarray([3.0, 3.0], jnp.float32), (K, 2))
    key = jax.random.key(0)
    rows = np.asarray(bk.loop_eval_batch(bank, old_idx, jnp.int32(1), Tg,
                                         use_coarse, cm, key, cfg))
    d0 = bk.unpack_loop(rows[0])
    d1 = bk.unpack_loop(rows[1])
    # coarse stage recovered the large offset and fine reg converged on it
    assert d0["coarse_valid"] and d0["coarse_used"]
    assert d0["code"] == 1
    np.testing.assert_allclose(d0["T"][:3, 3], T_true[:3, 3], atol=0.1)
    # candidate 1 (no coarse) must equal the direct odometry-guess ICP
    ref = mm_lls_icp(b_cl, a_cl, cfg.reg, jnp.eye(4, dtype=jnp.float32),
                     max_iter=cfg.reg.reg_max_iter_num_m2m)
    assert d1["code"] == int(ref.process_code)
    np.testing.assert_allclose(d1["T"], np.asarray(ref.transform),
                               atol=1e-5)


def test_submap_lazy_fetch_and_pickle(rng):
    from mulls_tpu.backend.submap import Submap
    a_cl, a_d = _synth_submap(7)
    host = (jax.device_get(a_cl), jax.device_get(a_d))
    calls = []

    def fetch():
        calls.append(1)
        return host

    lb = bk.local_bounds(a_cl)  # device handle, resolved lazily
    sm = Submap(sid=0, pose=np.eye(4), clouds=None, descriptors=None,
                frame_begin=0, frame_end=3, slot=0, fetch=fetch,
                local_bbx=lb)
    assert not calls  # construction must not materialize
    sm.compute_bounds()
    assert not calls  # bounds come from the 6-float AABB, not the clouds
    assert sm.bbx_min[0] <= -19.0 and sm.bbx_max[0] >= 19.0
    _ = sm.clouds
    assert len(calls) == 1
    _ = sm.descriptors
    assert len(calls) == 1  # one fetch covers both

    blob = pickle.dumps(sm)
    sm2 = pickle.loads(blob)
    assert sm2.slot == 0 and sm2._fetch is None
    np.testing.assert_allclose(np.asarray(sm2.clouds["ground"].xyz),
                               np.asarray(host[0]["ground"].xyz))

    # round-2 checkpoint compatibility: plain-field state dict
    old_state = {"sid": 1, "pose": np.eye(4), "clouds": host[0],
                 "descriptors": host[1], "frame_begin": 0, "frame_end": 1,
                 "center": np.zeros(3), "bbx_min": -np.ones(3),
                 "bbx_max": np.ones(3), "stable": True,
                 "span_min_conf": 0.5, "span_mean_conf": 0.9}
    sm3 = Submap.__new__(Submap)
    sm3.__setstate__(old_state)
    assert sm3.stable and sm3.slot == -1
    assert sm3.clouds is host[0]
    np.testing.assert_allclose(sm3.bbx_max, np.ones(3))
