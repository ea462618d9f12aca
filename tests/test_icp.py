import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulls_tpu.config import RegConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import FeatureCloud
from mulls_tpu.frontend.icp import mm_lls_icp


def _cloud(xyz, normal, cap, rng, intensity=None):
    n = len(xyz)
    out = FeatureCloud.empty(cap)
    inten = (intensity if intensity is not None
             else rng.uniform(50, 200, n)).astype(np.float32)
    return out.replace(
        xyz=jnp.asarray(np.pad(xyz, ((0, cap - n), (0, 0))), jnp.float32),
        normal=jnp.asarray(np.pad(normal, ((0, cap - n), (0, 0))), jnp.float32),
        intensity=jnp.asarray(np.pad(inten, (0, cap - n))),
        mask=jnp.asarray(np.arange(cap) < n),
    )


def _make_scene(rng, noise=0.01):
    """Structured scene: ground plane + 2 facades + 4 pillars."""
    gx, gy = np.meshgrid(np.linspace(-20, 20, 40), np.linspace(-20, 20, 40))
    ground = np.stack([gx.ravel(), gy.ravel(),
                       noise * rng.normal(size=gx.size)], -1)
    g_nrm = np.tile([0.0, 0.0, 1.0], (len(ground), 1))

    wy, wz = np.meshgrid(np.linspace(-10, 10, 30), np.linspace(0, 5, 12))
    wall1 = np.stack([15 + noise * rng.normal(size=wy.size),
                      wy.ravel(), wz.ravel()], -1)
    w1_nrm = np.tile([1.0, 0.0, 0.0], (len(wall1), 1))
    wx, wz2 = np.meshgrid(np.linspace(-12, 12, 30), np.linspace(0, 5, 12))
    wall2 = np.stack([wx.ravel(), 12 + noise * rng.normal(size=wx.size),
                      wz2.ravel()], -1)
    w2_nrm = np.tile([0.0, 1.0, 0.0], (len(wall2), 1))
    facade = np.concatenate([wall1, wall2])
    f_nrm = np.concatenate([w1_nrm, w2_nrm])

    posts = []
    for px, py in [(-8, -5), (5, 8), (-3, 9), (10, -7)]:
        z = np.linspace(0, 4, 25)
        posts.append(np.stack([
            px + noise * rng.normal(size=25),
            py + noise * rng.normal(size=25), z], -1))
    pillar = np.concatenate(posts)
    p_dir = np.tile([0.0, 0.0, 1.0], (len(pillar), 1))
    return (ground, g_nrm), (facade, f_nrm), (pillar, p_dir)


def _transform_np(T, pts):
    return pts @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]


@pytest.fixture(scope="module")
def scene():
    return _make_scene(np.random.default_rng(7))


def _clouds_from_scene(scene_parts, rng, T=None):
    out = {}
    caps = {"ground": 2048, "facade": 1024, "pillar": 128}
    for name, (pts, nrm) in zip(("ground", "facade", "pillar"), scene_parts):
        p, v = pts, nrm
        if T is not None:
            p = _transform_np(T, pts)
            v = nrm @ np.asarray(T)[:3, :3].T
        out[name] = _cloud(p, v, caps[name], rng)
    return out


def test_icp_recovers_known_transform(scene, rng):
    cfg = RegConfig(used_feature_type="111000")
    T_gt = se3.make_transform(jnp.asarray([0.4, -0.25, 0.08], jnp.float32),
                              jnp.asarray([0.01, -0.015, 0.03], jnp.float32))
    target = _clouds_from_scene(scene, rng)
    source = _clouds_from_scene(scene, rng, T=T_gt)  # source = T_gt @ target
    # intensities must correlate for the intensity weight; reuse target's
    for n in source:
        source[n] = source[n].replace(intensity=target[n].intensity)

    res = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg, jnp.eye(4), max_iter=20)
    # T maps source -> target, so T ~= T_gt^-1
    T_est = np.asarray(res.transform)
    T_expected = np.asarray(se3.inverse(T_gt))
    assert int(res.process_code) == 1
    np.testing.assert_allclose(T_est[:3, 3], T_expected[:3, 3], atol=0.02)
    np.testing.assert_allclose(T_est[:3, :3], T_expected[:3, :3], atol=2e-3)
    assert float(res.sigma) < 0.1
    assert float(res.confidence) > 0.5


def test_icp_uses_initial_guess(scene, rng):
    """A big offset that would break bare ICP converges from a good guess."""
    cfg = RegConfig(used_feature_type="111000")
    T_gt = se3.make_transform(jnp.asarray([3.0, -2.0, 0.1], jnp.float32),
                              jnp.asarray([0.0, 0.0, 0.12], jnp.float32))
    target = _clouds_from_scene(scene, rng)
    source = _clouds_from_scene(scene, rng, T=T_gt)
    for n in source:
        source[n] = source[n].replace(intensity=target[n].intensity)
    guess = se3.inverse(T_gt) @ se3.make_transform(
        jnp.asarray([0.2, 0.1, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, 0.01], jnp.float32))
    res = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg, guess, max_iter=20)
    T_est = np.asarray(res.transform)
    np.testing.assert_allclose(T_est, np.asarray(se3.inverse(T_gt)),
                               atol=0.03)
    assert int(res.process_code) == 1


def test_icp_too_few_correspondences(scene, rng):
    cfg = RegConfig(used_feature_type="111000")
    target = _clouds_from_scene(scene, rng)
    # source far away: no correspondences within threshold
    T_far = se3.make_transform(jnp.asarray([500.0, 0.0, 0.0], jnp.float32),
                               jnp.zeros(3, jnp.float32))
    source = _clouds_from_scene(scene, rng, T=T_far)
    res = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg, jnp.eye(4), max_iter=20)
    assert int(res.process_code) == -2


def test_icp_masked_padding_is_inert(scene, rng):
    """Garbage in masked slots must not change the result."""
    cfg = RegConfig(used_feature_type="111000")
    T_gt = se3.make_transform(jnp.asarray([0.2, 0.1, 0.0], jnp.float32),
                              jnp.asarray([0.0, 0.0, 0.02], jnp.float32))
    target = _clouds_from_scene(scene, rng)
    source = _clouds_from_scene(scene, rng, T=T_gt)
    for n in source:
        source[n] = source[n].replace(intensity=target[n].intensity)
    res1 = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg, jnp.eye(4), max_iter=15)
    poisoned = {}
    for n, c in source.items():
        bad = jnp.where(c.mask[:, None], c.xyz, 1e3)
        poisoned[n] = c.replace(xyz=bad)
    res2 = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        poisoned, target, cfg, jnp.eye(4), max_iter=15)
    np.testing.assert_allclose(np.asarray(res1.transform),
                               np.asarray(res2.transform), atol=1e-5)


def test_icp_information_matrix_sane(scene, rng):
    cfg = RegConfig(used_feature_type="111000")
    T_gt = se3.make_transform(jnp.asarray([0.1, 0.05, 0.02], jnp.float32),
                              jnp.asarray([0.005, 0.0, 0.01], jnp.float32))
    target = _clouds_from_scene(scene, rng)
    source = _clouds_from_scene(scene, rng, T=T_gt)
    for n in source:
        source[n] = source[n].replace(intensity=target[n].intensity)
    res = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg, jnp.eye(4), max_iter=20)
    info = np.asarray(res.information)
    assert np.abs(info - info.T).max() <= 1e-6 * np.abs(info).max()
    eig = np.linalg.eigvalsh(info)
    assert eig.min() > 0  # positive definite
