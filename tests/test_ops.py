import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulls_tpu.config import GroundFilterConfig, ShapeConfig
from mulls_tpu.ops import ground as ground_ops
from mulls_tpu.ops import neighbors as nbr
from mulls_tpu.ops import nms as nms_ops
from mulls_tpu.ops import pca as pca_ops
from mulls_tpu.ops import voxel as voxel_ops


def test_voxel_downsample_one_per_voxel(rng):
    pts = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    mask[1500:] = False
    keep = np.asarray(voxel_ops.voxel_downsample_mask(
        jnp.asarray(pts), jnp.asarray(mask), resolution=0.5))
    assert not keep[~mask].any()
    # at most one survivor per voxel among valid points
    vox = np.floor(pts[keep] / 0.5).astype(np.int64)
    uniq = np.unique(vox, axis=0)
    assert len(uniq) == keep.sum()
    # every occupied voxel keeps a representative (no hash collision loss
    # beyond a small tolerance)
    vox_all = np.unique(np.floor(pts[mask] / 0.5).astype(np.int64), axis=0)
    assert keep.sum() >= 0.93 * len(vox_all)


def test_random_downsample_count(rng):
    mask = jnp.asarray(rng.uniform(size=5000) < 0.7)
    out = voxel_ops.random_downsample(mask, 300, jax.random.key(0))
    assert int(out.sum()) == 300
    # keep_num above valid count keeps everything
    out2 = voxel_ops.random_downsample(mask, 10000, jax.random.key(0))
    assert int(out2.sum()) == int(mask.sum())


def test_dist_filter(rng):
    pts = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    mask = np.ones(1000, bool)
    keep = np.asarray(voxel_ops.dist_filter_mask(
        jnp.asarray(pts), jnp.asarray(mask), 5.0, 30.0))
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_array_equal(keep, (r >= 5.0) & (r <= 30.0))


def test_nearest_neighbor_matches_numpy(rng):
    q = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    p = rng.uniform(-5, 5, (700, 3)).astype(np.float32)
    pm = np.ones(700, bool)
    pm[650:] = False
    idx, d2 = nbr.nearest_neighbor(jnp.asarray(q), jnp.ones(300, bool),
                                   jnp.asarray(p), jnp.asarray(pm), chunk=128)
    d = ((q[:, None, :] - p[None, :650, :]) ** 2).sum(-1)
    ref_idx = d.argmin(1)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(d2), d.min(1), rtol=1e-4, atol=1e-4)


def test_radius_moments_matches_numpy(rng):
    q = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    p = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    pm = np.ones(400, bool)
    pm[350:] = False
    feats = rng.uniform(0, 1, (400, 2)).astype(np.float32)
    r = 1.0
    out = nbr.radius_moments(jnp.asarray(q), jnp.ones(100, bool),
                             jnp.asarray(p), jnp.asarray(pm),
                             jnp.float32(r), p_feats=jnp.asarray(feats),
                             close_fraction_sq=0.64, chunk=64)
    d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    adj = (d2 <= r * r) & pm[None, :]
    np.testing.assert_allclose(np.asarray(out["count"]), adj.sum(1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["sum_xyz"]),
                               adj.astype(np.float64) @ p, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["feat_sum"]),
                               adj.astype(np.float64) @ feats, rtol=2e-4, atol=2e-3)
    close = adj & (d2 <= 0.64 * r * r)
    np.testing.assert_allclose(np.asarray(out["close_count"]), close.sum(1), atol=1e-3)
    cov = np.asarray(nbr.cov_from_moments(out["count"], out["sum_xyz"],
                                          out["sum_outer"]))
    # covariance parity for a well-populated query
    i = int(adj.sum(1).argmax())
    sel = p[adj[i]]
    ref_cov = np.cov(sel.T, bias=True)
    np.testing.assert_allclose(cov[i], ref_cov, atol=2e-3)


def test_eigh_sym3x3_random(rng):
    A = rng.normal(size=(200, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1)  # PSD
    vals, vecs = pca_ops.eigh_sym3x3(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref = np.linalg.eigvalsh(A)[:, ::-1]
    np.testing.assert_allclose(vals, ref, rtol=2e-3, atol=2e-3)
    # eigenvector property: A v = lambda v
    for k in [0, 2]:
        av = np.einsum("nij,nj->ni", A, vecs[:, :, k])
        lv = vals[:, k][:, None] * vecs[:, :, k]
        np.testing.assert_allclose(av, lv, atol=5e-2)
    # orthonormality
    vtv = np.einsum("nij,nik->njk", vecs, vecs)
    np.testing.assert_allclose(vtv, np.tile(np.eye(3), (200, 1, 1)), atol=1e-2)


def test_eigh_sym3x3_degenerate():
    A = jnp.asarray([np.eye(3), np.diag([2.0, 2.0, 1.0]),
                     np.zeros((3, 3))], jnp.float32)
    vals, vecs = pca_ops.eigh_sym3x3(A)
    assert np.all(np.isfinite(np.asarray(vals)))
    assert np.all(np.isfinite(np.asarray(vecs)))
    np.testing.assert_allclose(np.asarray(vals)[0], [1, 1, 1], atol=1e-5)


def test_pca_features_line_and_plane(rng):
    # a vertical line and a horizontal plane
    t = np.linspace(0, 5, 100)
    line = np.stack([np.zeros_like(t) + 0.01 * rng.normal(size=100),
                     np.zeros_like(t) + 0.01 * rng.normal(size=100), t], -1)
    xx, yy = np.meshgrid(np.linspace(0, 3, 20), np.linspace(0, 3, 20))
    plane = np.stack([xx.ravel() + 10, yy.ravel(),
                      0.01 * rng.normal(size=400)], -1)
    pts = np.concatenate([line, plane]).astype(np.float32)
    m = jnp.ones(len(pts), bool)
    f = pca_ops.pca_features(jnp.asarray(pts), m, jnp.asarray(pts), m,
                             radius=0.8, min_k=4, chunk=128)
    lin = np.asarray(f.linearity)
    pla = np.asarray(f.planarity)
    principal = np.asarray(f.principal)
    normal = np.asarray(f.normal)
    # middle of the line: strongly linear, principal ~ +-z
    assert lin[50] > 0.9
    assert abs(principal[50, 2]) > 0.95
    # interior of the plane: strongly planar, normal ~ +-z
    mid = 100 + 10 * 20 + 10
    assert pla[mid] > 0.9
    assert abs(normal[mid, 2]) > 0.95


def _greedy_nms(pts, sal, radius):
    order = np.argsort(-sal, kind="stable")
    keep = np.zeros(len(pts), bool)
    suppressed = np.zeros(len(pts), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        d = np.linalg.norm(pts - pts[i], axis=1)
        sup = d < radius
        sup[i] = False
        suppressed |= sup
    return keep


def test_nms_close_to_greedy(rng):
    pts = rng.uniform(0, 20, (500, 3)).astype(np.float32)
    sal = rng.uniform(0, 1, 500).astype(np.float32)
    keep = np.asarray(nms_ops.non_max_suppress(
        jnp.asarray(pts), jnp.asarray(sal), jnp.ones(500, bool),
        radius=1.5, iterations=4, chunk=128))
    ref = _greedy_nms(pts, sal, 1.5)
    # no two kept points within the radius
    kept = pts[keep]
    d = np.linalg.norm(kept[:, None] - kept[None], axis=-1)
    np.fill_diagonal(d, 10.0)
    assert d.min() >= 1.5 - 1e-5
    # close to the greedy solution
    agreement = (keep == ref).mean()
    assert agreement > 0.93


def test_ground_filter_synthetic(rng):
    """Flat ground at z=0 with a wall and a floating blob: the filter must
    call the plane 'ground' and the rest 'unground' with sane heights."""
    n_g, n_w = 12000, 1500
    gx = rng.uniform(-30, 30, n_g)
    gy = rng.uniform(-30, 30, n_g)
    ground = np.stack([gx, gy, 0.02 * rng.normal(size=n_g)], -1)
    wall = np.stack([np.full(n_w, 10.0) + 0.05 * rng.normal(size=n_w),
                     rng.uniform(-20, 20, n_w),
                     rng.uniform(0.3, 6.0, n_w)], -1)
    pts = np.concatenate([ground, wall]).astype(np.float32)
    n = len(pts)
    cap = 16384
    pts = np.concatenate([pts, np.zeros((cap - n, 3), np.float32)])
    mask = np.zeros(cap, bool)
    mask[:n] = True
    inten = np.zeros(cap, np.float32)

    cfg = GroundFilterConfig(dist_inverse_sampling_method=0,
                             gf_nonground_down_rate=1)
    shapes = ShapeConfig(grid_dim=64)
    res = ground_ops.fast_ground_filter(
        jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(mask), cfg, shapes,
        jax.random.key(0))
    is_g = np.asarray(res.is_ground)
    is_u = np.asarray(res.is_unground)
    # ground points recalled, wall points not classified as ground
    assert is_g[:n_g].mean() > 0.85
    assert is_g[n_g:n].mean() < 0.02
    # wall points land in unground with positive height; exact
    # height-above-ground only for below-pre-gate points (above the gate the
    # reference uses the approximate mean-height baseline)
    assert is_u[n_g:n].mean() > 0.9
    h = np.asarray(res.height)[n_g:n]
    gate = float(np.mean(np.concatenate([ground[:, 2], wall[:, 2]]))) + 2.0
    sel = is_u[n_g:n] & (wall[:, 2] <= gate)
    np.testing.assert_allclose(h[sel], wall[sel, 2], atol=0.4)
    assert (h[is_u[n_g:n]] > 0.0).all()
    # normals near +z for ground points
    nz = np.asarray(res.normal)[:n_g][is_g[:n_g]][:, 2]
    assert (np.abs(nz) > 0.9).mean() > 0.95
    assert not (is_g & ~np.asarray(mask)).any()


def test_ground_normal_ransac_robust_to_outliers(rng):
    """Method 3 (per-cell RANSAC plane, `cfilter.hpp:2038-2054`) recovers a
    tilted plane's normal despite gross outliers that would bend an LS
    fit."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mulls_tpu.config import GroundFilterConfig, ShapeConfig
    from mulls_tpu.ops.ground import fast_ground_filter

    n = 8192
    # one big cell: gently tilted plane z = 0.08 x + noise
    x = rng.uniform(-1.2, 1.2, n).astype(np.float32)
    y = rng.uniform(-1.2, 1.2, n).astype(np.float32)
    z = (0.08 * x + 0.005 * rng.normal(size=n)).astype(np.float32)
    # 15% outliers well above the plane but inside the in-grid band
    out = rng.uniform(size=n) < 0.15
    z = np.where(out, z + rng.uniform(0.15, 0.22, n), z).astype(np.float32)
    xyz = jnp.asarray(np.stack([x, y, z], -1))
    cfg = GroundFilterConfig(gf_grid_size=3.0, gf_in_grid_h_thre=0.3,
                             gf_neigh_grid_h_thre=1.5, gf_max_h=10.0,
                             ground_normal_method=3, gf_grid_min_pt_num=10,
                             dist_inverse_sampling_method=0)
    shapes = ShapeConfig(n_raw=n, grid_dim=4)
    g = fast_ground_filter(xyz, jnp.zeros(n), jnp.ones(n, bool), cfg,
                           shapes, jax.random.key(0))
    gmask = np.asarray(g.is_ground)
    assert gmask.sum() > 0.5 * n
    # consensus excludes the lifted outliers
    assert (gmask & out).sum() < 0.02 * n
    nrm = np.asarray(g.normal)[gmask].mean(0)
    nrm /= np.linalg.norm(nrm)
    expect = np.array([-0.08, 0.0, 1.0])
    expect /= np.linalg.norm(expect)
    assert abs(float(nrm @ expect)) > 0.999, nrm


def test_ground_normal_ransac_small_cells(rng):
    """Degeneracy regression: with ~12-point cells, duplicate picks give
    zero-cross 'planes' that must be gated out, or outliers sweep the
    consensus vote."""
    import jax
    import jax.numpy as jnp
    from mulls_tpu.config import GroundFilterConfig, ShapeConfig
    from mulls_tpu.ops.ground import fast_ground_filter

    g = 8
    per = 12
    cell_sz = 2.5
    pts, out_flags = [], []
    for r in range(g):
        for c in range(g):
            x = (c + rng.uniform(0.05, 0.95, per)) * cell_sz
            y = (r + rng.uniform(0.05, 0.95, per)) * cell_sz
            z = 0.01 * rng.normal(size=per)
            o = rng.uniform(size=per) < 0.25
            z = np.where(o, z + rng.uniform(0.15, 0.22, per), z)
            pts.append(np.stack([x, y, z], -1))
            out_flags.append(o)
    xyz = jnp.asarray(np.concatenate(pts), jnp.float32)
    out = np.concatenate(out_flags)
    n = xyz.shape[0]
    cfg = GroundFilterConfig(gf_grid_size=cell_sz, gf_in_grid_h_thre=0.3,
                             gf_neigh_grid_h_thre=1.5, gf_max_h=10.0,
                             ground_normal_method=3, gf_grid_min_pt_num=6,
                             dist_inverse_sampling_method=0)
    shapes = ShapeConfig(n_raw=n, grid_dim=g)
    res = fast_ground_filter(xyz, jnp.zeros(n), jnp.ones(n, bool), cfg,
                             shapes, jax.random.key(1))
    gmask = np.asarray(res.is_ground)
    inlier_keep = (gmask & ~out).sum() / max((~out).sum(), 1)
    outlier_keep = (gmask & out).sum() / max(out.sum(), 1)
    assert inlier_keep > 0.7, inlier_keep
    # max-consensus RANSAC on 12-point cells cannot fully separate gently
    # tilted planes that pass within dist_thre (PCL's SAC_RANSAC has the
    # same ambiguity); the regression here is against the DEGENERATE-
    # hypothesis failure mode, where ~56% of outliers leaked because a
    # zero-normal "plane" counted every point as an inlier
    assert outlier_keep < 0.35, outlier_keep
    assert outlier_keep < inlier_keep / 2.0


def test_knn_class_counts_tracks_exact_topk(rng):
    """Regression for the statistical radius-shrink redesign of the
    reference's radiusSearch(max_nn=K) (`pca.hpp:326`): on a representative
    mixed-density cloud the descriptor-level category percentages must stay
    close to the EXACT K-nearest-cap statistics — within the tolerance NCC
    matching absorbs (the 11-dim comparison vector is correlated, not
    exact-matched, `cregistration.hpp:444-515`)."""
    # support cloud: dense urban patch + sparse patch, 4 interleaved classes
    n_dense, n_sparse = 6000, 800
    dense = np.stack([rng.uniform(0, 20, n_dense),
                      rng.uniform(0, 20, n_dense),
                      rng.uniform(0, 6, n_dense)], -1)
    sparse = np.stack([rng.uniform(40, 80, n_sparse),
                      rng.uniform(40, 80, n_sparse),
                      rng.uniform(0, 6, n_sparse)], -1)
    p_xyz = np.concatenate([dense, sparse]).astype(np.float32)
    n_p = len(p_xyz)
    cls = rng.integers(0, 4, n_p)
    onehot = np.eye(4, dtype=np.float32)[cls]
    inten = rng.uniform(0, 255, n_p).astype(np.float32)

    n_q = 256
    qi = rng.choice(n_p, n_q, replace=False)
    q_xyz = p_xyz[qi] + rng.normal(scale=0.05, size=(n_q, 3)).astype(np.float32)
    q_mask = np.ones(n_q, bool)
    p_mask = np.ones(n_p, bool)

    radius, k = 2.0, 50
    close_r2 = 0.64 * radius ** 2

    got = jax.tree.map(np.asarray, nbr.knn_class_counts(
        jnp.asarray(q_xyz), jnp.asarray(q_mask), jnp.asarray(p_xyz),
        jnp.asarray(p_mask), radius, k, jnp.asarray(onehot),
        jnp.asarray(inten), close_r2))

    # exact reference: K nearest within radius, close/far at close_r2
    d2 = ((q_xyz[:, None, :] - p_xyz[None, :, :]) ** 2).sum(-1)
    sims = []
    counts_ok = 0
    for q in range(n_q):
        in_r = np.where(d2[q] <= radius ** 2)[0]
        keep = in_r[np.argsort(d2[q][in_r])][:k]
        close = keep[d2[q][keep] <= close_r2]
        far = keep[d2[q][keep] > close_r2]
        exact = np.concatenate([onehot[close].sum(0) if len(close) else
                                np.zeros(4),
                                onehot[far].sum(0) if len(far) else
                                np.zeros(4)])
        approx = np.concatenate([got["close_counts"][q],
                                 got["far_counts"][q]])
        # descriptor uses PERCENTAGES: normalize both count vectors
        if exact.sum() < 5:  # too few neighbors for a stable keypoint
            continue
        counts_ok += 1
        e = exact / exact.sum()
        a = approx / max(approx.sum(), 1e-6)
        sims.append(float(np.dot(e, a)
                          / max(np.linalg.norm(e) * np.linalg.norm(a),
                                1e-9)))
    sims = np.asarray(sims)
    assert counts_ok > 150
    # NCC tolerance: the 8-dim percentage vectors stay strongly correlated
    assert np.median(sims) > 0.97, f"median cosine {np.median(sims):.3f}"
    assert (sims > 0.85).mean() > 0.9, \
        f"only {(sims > 0.85).mean():.2%} of keypoints within tolerance"
    # the K cap must actually bind in the dense region
    dense_q = np.where(q_xyz[:, 0] < 30)[0]
    assert got["count"][dense_q].max() <= 2.5 * k
