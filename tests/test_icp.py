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


def _corridor_scene(rng, n_vertex=14, vertex_noise=0.6):
    """Degenerate corridor: ground + two walls parallel to x — nothing
    planar constrains translation along x.  A handful of NOISY vertex
    points (pt2pt) weakly 'observe' x and would drag the solve."""
    gx, gy = np.meshgrid(np.linspace(-25, 25, 60), np.linspace(-6, 6, 14))
    ground = np.stack([gx.ravel(), gy.ravel(),
                       0.01 * rng.normal(size=gx.size)], -1)
    g_nrm = np.tile([0.0, 0.0, 1.0], (len(ground), 1))
    walls = []
    for y, ny in ((-6.0, 1.0), (6.0, -1.0)):
        wx, wz = np.meshgrid(np.linspace(-25, 25, 60), np.linspace(0, 5, 10))
        walls.append((np.stack([wx.ravel(),
                                y + 0.01 * rng.normal(size=wx.size),
                                wz.ravel()], -1),
                      np.tile([0.0, ny, 0.0], (wx.size, 1))))
    facade = np.concatenate([w[0] for w in walls])
    f_nrm = np.concatenate([w[1] for w in walls])
    vert = np.stack([rng.uniform(-20, 20, n_vertex),
                     rng.uniform(-5, 5, n_vertex),
                     rng.uniform(0, 3, n_vertex)], -1)
    return (ground, g_nrm), (facade, f_nrm), (vert, np.zeros((n_vertex, 3)))


def test_icp_degeneracy_keeps_guess_along_corridor(rng):
    """Degeneracy-aware remapping (TPU-build extension): in a corridor the
    along-track direction is observed only by a few noisy vertex points.
    With remapping ON the solve must hold the (correct) initial guess
    along x instead of following vertex noise; planar directions still
    converge.  With the threshold at 0 the noise pulls x off."""
    import dataclasses
    parts = _corridor_scene(rng)
    T_gt = se3.make_transform(jnp.asarray([1.2, 0.12, 0.03], jnp.float32),
                              jnp.asarray([0.0, 0.0, 0.0], jnp.float32))
    caps = {"ground": 1024, "facade": 2048, "vertex": 64}
    target, source = {}, {}
    for name, (pts, nrm) in zip(("ground", "facade", "vertex"), parts):
        target[name] = _cloud(pts, nrm, caps[name], rng)
        p = _transform_np(T_gt, pts)
        if name == "vertex":  # independent large noise on the weak class
            p = p + 0.6 * rng.normal(size=p.shape)
        source[name] = _cloud(p, nrm @ np.asarray(T_gt)[:3, :3].T,
                              caps[name], rng,
                              intensity=np.asarray(target[name].intensity)
                              [:len(pts)])

    guess = se3.inverse(T_gt)  # exact
    T_exp = np.asarray(se3.inverse(T_gt))

    cfg_on = RegConfig(used_feature_type="101001", corr_weight_strategy="1000")
    res_on = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg_on, guess, max_iter=12)
    err_on = abs(float(np.asarray(res_on.transform)[0, 3] - T_exp[0, 3]))

    cfg_off = dataclasses.replace(cfg_on, degeneracy_thre=0.0)
    res_off = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg_off, guess, max_iter=12)
    err_off = abs(float(np.asarray(res_off.transform)[0, 3] - T_exp[0, 3]))

    # constrained directions stay accurate either way
    assert abs(float(np.asarray(res_on.transform)[1, 3] - T_exp[1, 3])) < 0.05
    assert abs(float(np.asarray(res_on.transform)[2, 3] - T_exp[2, 3])) < 0.05
    # remapping holds the guess along the corridor
    assert err_on < 0.05, (err_on, err_off)
    # and the unprotected solve is measurably worse (the failure is real);
    # relative check — the absolute magnitude of the noise-induced pull
    # varies with backend/rng, what matters is that remapping beats it
    assert err_off > 10 * err_on and err_off > 0.01, (err_on, err_off)


def test_icp_add_length_recovers_wide_offset(scene, rng):
    """The `add_length` recovery gate (`mulls_slam.cpp:650-657`): an offset
    too large for the normal correspondence gate converges once the
    initial gate is widened — the post-failure re-convergence path the
    fused SLAM step arms for the frame after a failed registration."""
    cfg = RegConfig(used_feature_type="111000", corr_dis_thre_init=0.8,
                    corr_dis_thre_min=0.3)
    T_gt = se3.make_transform(jnp.asarray([1.6, -0.5, 0.0], jnp.float32),
                              jnp.asarray([0.0, 0.0, 0.06], jnp.float32))
    target = _clouds_from_scene(scene, rng)
    source = _clouds_from_scene(scene, rng, T=T_gt)
    for n in source:
        source[n] = source[n].replace(intensity=target[n].intensity)

    fn = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))
    bare = fn(source, target, cfg, jnp.eye(4), max_iter=20)
    widened = fn(source, target, cfg, jnp.eye(4), max_iter=20,
                 dis_thre_add=jnp.float32(1.0))
    # the bare gate must NOT produce a good, confident result (it either
    # fails outright or lands away from the truth)
    T_exp = np.asarray(se3.inverse(T_gt))
    bare_off = np.linalg.norm(np.asarray(bare.transform)[:3, 3]
                              - T_exp[:3, 3])
    assert int(bare.process_code) != 1 or bare_off > 0.3, (
        int(bare.process_code), bare_off)
    assert int(widened.process_code) == 1
    np.testing.assert_allclose(np.asarray(widened.transform)[:3, 3],
                               T_exp[:3, 3], atol=0.05)


def test_normal_shooting_changes_correspondences_and_converges(scene, rng):
    """--normal_shooting_on must actually change the correspondence choice
    (`cregistration.hpp:1729-1737`) — it was a silent config no-op once —
    and the ICP must still converge with it enabled."""
    from mulls_tpu.frontend.icp import _find_corres
    from mulls_tpu.core.cloud import FeatureCloud

    # target: sloped plane; the query normals are VERTICAL (noisy source
    # normals in a real scan) — on a slope the Euclidean 1-NN picks the
    # perpendicular foot while the vertical shooting ray hits the surface
    # ~h*sin(t)*cos(t) away, more than one grid spacing here
    gx, gy = np.meshgrid(np.linspace(-10, 10, 60), np.linspace(-10, 10, 60))
    tgt_xyz = np.stack([gx.ravel(), gy.ravel(), 0.3 * gx.ravel()], -1)
    nrm = np.tile(np.array([-0.3, 0.0, 1.0]) / np.hypot(0.3, 1.0),
                  (tgt_xyz.shape[0], 1))
    tgt = _cloud(tgt_xyz, nrm, 4096, rng)
    q_xyz = jnp.asarray(tgt_xyz[::7] + np.array([0.0, 0.0, 1.5]),
                        jnp.float32)
    q_dir = jnp.asarray(np.tile([0.0, 0.0, 1.0], (q_xyz.shape[0], 1)),
                        jnp.float32)
    q_mask = jnp.ones(q_xyz.shape[0], bool)

    c_nn = _find_corres(q_xyz, q_dir, q_mask, tgt, 2.0, 0.7,
                        normal_check=True, normal_shooting=False)
    c_ns = _find_corres(q_xyz, q_dir, q_mask, tgt, 2.0, 0.7,
                        normal_check=True, normal_shooting=True)
    diff = int(np.sum(np.asarray(c_nn.t_idx) != np.asarray(c_ns.t_idx)))
    assert diff > 0, "normal shooting chose identical correspondences"
    assert int(np.sum(np.asarray(c_ns.valid))) > 0

    # end-to-end: the flag-enabled ICP still recovers a known transform
    cfg = RegConfig(used_feature_type="111000", normal_shooting_on=True)
    T_gt = se3.make_transform(jnp.asarray([0.3, -0.2, 0.05], jnp.float32),
                              jnp.asarray([0.01, -0.01, 0.02], jnp.float32))
    target = _clouds_from_scene(scene, rng)
    source = _clouds_from_scene(scene, rng, T=T_gt)
    for n in source:
        source[n] = source[n].replace(intensity=target[n].intensity)
    res = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))(
        source, target, cfg, jnp.eye(4), max_iter=20)
    T_expected = np.asarray(se3.inverse(T_gt))
    assert int(res.process_code) == 1
    np.testing.assert_allclose(np.asarray(res.transform)[:3, 3],
                               T_expected[:3, 3], atol=0.05)
