import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulls_tpu.backend import coarse_reg as cr
from mulls_tpu.backend import ncc
from mulls_tpu.backend.pgo import (PoseGraph, optimize_pose_graph,
                                   wrong_edge_check)
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import VertexDescriptors


# --- coarse registration ----------------------------------------------------


def _corr_set(rng, n=200, outlier_frac=0.5, noise=0.01):
    src = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    e = jnp.asarray([0.05, -0.1, 0.4], jnp.float32)
    t = jnp.asarray([2.0, -1.0, 0.3], jnp.float32)
    T = se3.make_transform(t, e)
    tgt = np.array(se3.transform_points(T, jnp.asarray(src)))
    tgt += noise * rng.normal(size=tgt.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    idx = rng.choice(n, n_out, replace=False)
    tgt[idx] = rng.uniform(-20, 20, (n_out, 3))
    return jnp.asarray(src), jnp.asarray(tgt), np.asarray(T), idx


def test_ransac_with_outliers(rng):
    src, tgt, T_gt, _ = _corr_set(rng, outlier_frac=0.6)
    res = cr.coarse_reg_ransac(src, tgt, jnp.ones(len(src), bool),
                               jax.random.key(0), inlier_thre=0.1)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.transform), T_gt, atol=0.05)


def test_gnc_with_outliers(rng):
    src, tgt, T_gt, _ = _corr_set(rng, outlier_frac=0.6)
    res = cr.coarse_reg_gnc(src, tgt, jnp.ones(len(src), bool),
                            jax.random.key(0), noise_bound=0.05)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.transform), T_gt, atol=0.08)


def test_double_check_tran():
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(se3.make_transform(jnp.asarray([1.0, 0, 0]),
                                       jnp.zeros(3)))
    assert bool(cr.double_check_tran(jnp.asarray(T2), jnp.asarray(T1),
                                     2.0, 10.0))
    assert not bool(cr.double_check_tran(jnp.asarray(T2), jnp.asarray(T1),
                                         0.5, 10.0))


# --- NCC matching -----------------------------------------------------------


def _descriptors(rng, n, cap):
    vec = rng.uniform(0, 100, (n, 11)).astype(np.float32)
    v = np.zeros((cap, 11), np.float32)
    v[:n] = vec
    m = np.zeros(cap, bool)
    m[:n] = True
    return VertexDescriptors(vec=jnp.asarray(v), mask=jnp.asarray(m)), vec


def test_ncc_match_identical_descriptors(rng):
    tgt, vec = _descriptors(rng, 50, 64)
    # source = permuted copy of target
    perm = rng.permutation(50)
    src_v = np.zeros((64, 11), np.float32)
    src_v[:50] = vec[perm]
    src = VertexDescriptors(vec=jnp.asarray(src_v),
                            mask=jnp.asarray(np.arange(64) < 50))
    m = ncc.match_ncc(tgt, src, fixed_num_corr=False, reciprocal=True)
    valid = np.asarray(m.valid)
    s_idx = np.asarray(m.s_idx)
    # each valid target matches its permuted twin
    hits = 0
    for t in range(50):
        if valid[t]:
            hits += perm[s_idx[t]] == t
    assert hits >= 45


def test_ncc_fixed_num_usage_caps(rng):
    tgt, _ = _descriptors(rng, 40, 64)
    src, _ = _descriptors(rng, 40, 64)
    m = ncc.match_ncc(tgt, src, fixed_num_corr=True, corr_num=200,
                      max_corr_num=3)
    valid = np.asarray(m.valid)
    for arr in (np.asarray(m.t_idx)[valid], np.asarray(m.s_idx)[valid]):
        _, counts = np.unique(arr, return_counts=True)
        assert counts.max() <= 4  # max_corr_num + 1 (reference keeps <=)


# --- pose graph -------------------------------------------------------------


def _chain_graph(rng, m=12, drift=0.15):
    """Ground-truth loop trajectory; odometry edges with drift + one exact
    loop edge closing the circle."""
    angles = np.linspace(0, 2 * np.pi, m, endpoint=False)
    gt_t = np.stack([10 * np.cos(angles), 10 * np.sin(angles),
                     np.zeros(m)], -1).astype(np.float32)
    gt_q = np.tile([1.0, 0, 0, 0], (m, 1)).astype(np.float32)

    edges_i, edges_j, ets, eqs = [], [], [], []
    for k in range(m - 1):
        edges_i.append(k)
        edges_j.append(k + 1)
        ets.append(gt_t[k + 1] - gt_t[k])  # Ra = I
        eqs.append([1.0, 0, 0, 0])
    # loop edge m-1 -> 0
    edges_i.append(m - 1)
    edges_j.append(0)
    ets.append(gt_t[0] - gt_t[m - 1])
    eqs.append([1.0, 0, 0, 0])

    # initial values: integrate odometry with accumulated drift
    init_t = gt_t.copy()
    for k in range(1, m):
        init_t[k] = init_t[k - 1] + (gt_t[k] - gt_t[k - 1]) \
            + drift * rng.normal(size=3).astype(np.float32)

    e = len(edges_i)
    info = np.tile(np.eye(6, dtype=np.float32), (e, 1, 1))
    return PoseGraph(
        node_t=jnp.asarray(init_t), node_q=jnp.asarray(gt_q),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        edge_t=jnp.asarray(np.asarray(ets)),
        edge_q=jnp.asarray(np.asarray(eqs)),
        edge_info=jnp.asarray(info),
        edge_mask=jnp.ones(e, bool),
        fixed=jnp.asarray(np.arange(m) == 0),
    ), gt_t


def test_pgo_closes_loop(rng):
    graph, gt_t = _chain_graph(rng)
    t, q, chi2 = optimize_pose_graph(graph, iterations=25)
    t = np.asarray(t)
    # first node stays fixed, all nodes pulled to ground truth
    np.testing.assert_allclose(t[0], gt_t[0], atol=1e-4)
    np.testing.assert_allclose(t, gt_t, atol=0.05)
    assert float(chi2) < 1e-4


def test_pgo_respects_fixed_nodes(rng):
    graph, _ = _chain_graph(rng)
    t0 = np.asarray(graph.node_t)
    graph = graph._replace(fixed=jnp.ones(graph.num_nodes, bool))
    t, q, _ = optimize_pose_graph(graph, iterations=10)
    np.testing.assert_allclose(np.asarray(t), t0, atol=1e-5)


def test_pgo_masked_edges_ignored(rng):
    graph, gt_t = _chain_graph(rng)
    # add a wildly wrong but masked-out edge
    bad_t = graph.edge_t.at[-1].set(jnp.asarray([100.0, 0, 0]))
    mask = graph.edge_mask.at[-1].set(False)
    g_bad_masked = graph._replace(edge_t=bad_t, edge_mask=mask)
    t, _, _ = optimize_pose_graph(g_bad_masked, iterations=25)
    # without the loop edge the drifted odometry is the optimum: node 1..m
    # just keep (approximately) their initial odometry-consistent values
    assert np.all(np.isfinite(np.asarray(t)))


def test_wrong_edge_check(rng):
    graph, gt_t = _chain_graph(rng, drift=0.0)
    bad_t = graph.edge_t.at[0].set(jnp.asarray([50.0, 0, 0]))
    g = graph._replace(edge_t=bad_t)
    bad = wrong_edge_check(g, g.node_t, g.node_q, 5.0, 25.0)
    bad = np.asarray(bad)
    assert bad[0]
    assert not bad[1:].any()


def test_gnc_with_partial_mask_large_translation(rng):
    """Regression: with ANY masked-out row, jnp.median over NaN-filled
    rows used to zero the translation estimate — catastrophic for loop
    closures whose true translation exceeds the inlier gate."""
    src, tgt, T_gt, _ = _corr_set(rng, n=300, outlier_frac=0.4)
    # large translation: well beyond 2 * noise_bound
    T_big = T_gt.copy()
    T_big[:3, 3] += [15.0, -8.0, 2.0]
    tgt_big = np.asarray(tgt) + np.asarray([15.0, -8.0, 2.0],
                                           np.float32)
    mask = np.ones(len(src), bool)
    mask[rng.choice(len(src), 120, replace=False)] = False  # 40% invalid
    res = cr.coarse_reg_gnc(src, jnp.asarray(tgt_big), jnp.asarray(mask),
                            jax.random.key(0), noise_bound=0.05)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.transform)[:3, 3],
                               T_big[:3, 3], atol=0.1)


def test_ransac_with_partial_mask(rng):
    src, tgt, T_gt, _ = _corr_set(rng, n=300, outlier_frac=0.5)
    mask = np.ones(len(src), bool)
    mask[rng.choice(len(src), 100, replace=False)] = False
    res = cr.coarse_reg_ransac(src, tgt, jnp.asarray(mask),
                               jax.random.key(1), inlier_thre=0.1)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.transform), T_gt, atol=0.05)


# --- consistency clique + BEV correlation (TEASER-robustness stand-ins) ----


def test_clique_consistency_extreme_outliers(rng):
    """>90% outliers: the clique stage must isolate the inlier set that
    GNC/RANSAC alone cannot see (`cregistration.hpp:699-727` role)."""
    src, tgt, T_gt, out_idx = _corr_set(rng, n=400, outlier_frac=0.92,
                                        noise=0.02)
    keep, size = cr.clique_consistency_mask(src, tgt,
                                            jnp.ones(len(src), bool),
                                            eps=0.3)
    kn = np.asarray(keep)
    is_out = np.zeros(len(src), bool)
    is_out[out_idx] = True
    assert int(size) >= 16
    # kept set must be dominated by true inliers
    assert (~is_out[kn]).mean() > 0.9


def test_gnc_extreme_outliers(rng):
    src, tgt, T_gt, _ = _corr_set(rng, n=400, outlier_frac=0.92, noise=0.02)
    res = cr.coarse_reg_gnc(src, tgt, jnp.ones(len(src), bool),
                            jax.random.key(1), noise_bound=0.15)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.transform), T_gt, atol=0.12)


def _structured_scene(rng, n=3000):
    """Walls + posts: enough BEV structure to pin yaw and translation."""
    pts = []
    for (x0, y0, x1, y1) in [(-30, -8, 30, -8), (-30, 6, 30, 6),
                             (-30, -8, -30, 6), (10, -8, 10, 6)]:
        m = n // 8
        a = rng.uniform(0, 1, m)[:, None]
        seg = np.stack([x0 + a[:, 0] * (x1 - x0), y0 + a[:, 0] * (y1 - y0),
                        rng.uniform(0, 4, m)], 1)
        pts.append(seg)
    for (px, py) in [(-20, -2), (-5, 3), (18, 1), (25, -5)]:
        m = n // 8
        pts.append(np.stack([px + 0.1 * rng.normal(size=m),
                             py + 0.1 * rng.normal(size=m),
                             rng.uniform(0, 5, m)], 1))
    return np.concatenate(pts).astype(np.float32)


def test_coarse_reg_bev_recovers_large_offset(rng):
    tgt = _structured_scene(rng)
    yaw = np.radians(25.0)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([9.0, -4.0, 0.3], np.float32)
    # target = R src + t  =>  src = R^-1 (tgt - t)
    src = (tgt - t) @ R
    res = cr.coarse_reg_bev(jnp.asarray(src), jnp.ones(len(src), bool),
                            jnp.asarray(tgt), jnp.ones(len(tgt), bool))
    assert bool(res.valid)
    T = np.asarray(res.transform)
    assert np.linalg.norm(T[:3, 3][:2] - t[:2]) < 1.0
    assert abs(T[2, 3] - t[2]) < 1.0
    cos_err = (np.trace(T[:3, :3] @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos_err, -1, 1))) < 4.0


def test_pgo_node_bounds_clamp_updates(rng):
    """Ceres parameter-bound parity (`graph_optimizer.cpp:594-657`): a
    bounded node cannot move further than its per-node limit from its
    initial pose, per translation component and in rotation angle."""
    graph, gt_t = _chain_graph(rng)
    m = graph.num_nodes
    init_t = np.asarray(graph.node_t)

    # unbounded solve moves late nodes well beyond 0.05 m
    t_free, _, _ = optimize_pose_graph(graph, iterations=25)
    moved = np.abs(np.asarray(t_free) - init_t).max(axis=1)
    assert moved[1:].max() > 0.05

    lim = np.full(m, 0.05, np.float32)
    g_b = graph._replace(t_limit=jnp.asarray(lim),
                         r_limit=jnp.asarray(np.full(m, 0.01, np.float32)))
    t_b, q_b, _ = optimize_pose_graph(g_b, iterations=25)
    off = np.abs(np.asarray(t_b) - init_t)
    assert off.max() <= 0.05 + 1e-5
    # rotation deviation capped at ~2*r_limit radians
    qd = np.asarray(q_b) * np.asarray(graph.node_q)  # both near identity
    ang = 2 * np.arccos(np.clip(np.abs(np.asarray(q_b)[:, 0]), 0, 1))
    assert ang.max() <= 2 * 0.01 + 1e-4

    # infinite bounds reproduce the unbounded solution
    g_inf = graph._replace(
        t_limit=jnp.full((m,), np.inf, jnp.float32),
        r_limit=jnp.full((m,), np.inf, jnp.float32))
    t_inf, _, _ = optimize_pose_graph(g_inf, iterations=25)
    np.testing.assert_allclose(np.asarray(t_inf), np.asarray(t_free),
                               atol=1e-3)


def _mini_backend(method="ceres"):
    """Hand-built SlamBackend: 5 submaps on a line with drift, adjacent
    edges from odometry, one exact loop edge 4 -> 0."""
    import dataclasses as _dc
    from mulls_tpu.config import MullsConfig
    from mulls_tpu.backend.submap import (ADJACENT_EDGE, REG_EDGE, Edge,
                                          SlamBackend, Submap)
    from mulls_tpu.core.cloud import FEATURE_NAMES, FeatureCloud

    cfg = MullsConfig()
    cfg = cfg.replace(submap=_dc.replace(
        cfg.submap, pose_graph_optimization_method=method,
        pgo_max_iter=25))
    be = SlamBackend(cfg)
    clouds = {n: FeatureCloud.empty(8) for n in FEATURE_NAMES}
    gt = np.asarray([[k * 5.0, 0, 0] for k in range(5)])
    drift = np.asarray([[0, 0, 0], [0, .2, 0], [0, .5, 0],
                        [0, .9, 0], [0, 1.4, 0]])
    for k in range(5):
        p = np.eye(4)
        p[:3, 3] = gt[k] + drift[k]
        s = Submap(sid=k, pose=p, clouds=clouds, descriptors=None,
                   frame_begin=k, frame_end=k)
        s.compute_bounds()
        be.submaps.append(s)
    for k in range(4):
        T = np.eye(4)
        T[:3, 3] = (gt[k + 1] + drift[k + 1]) - (gt[k] + drift[k])
        be.edges.append(Edge(i=k, j=k + 1, T=T, info=np.eye(6),
                             kind=ADJACENT_EDGE))
    T_loop = np.eye(4)
    T_loop[:3, 3] = gt[4] - gt[0]  # exact measurement
    be.edges.append(Edge(i=0, j=4, T=T_loop, info=10 * np.eye(6),
                         kind=REG_EDGE))
    return be, gt


@pytest.mark.parametrize("method", ["ceres", "g2o", "gtsam"])
def test_backend_pgo_method_profiles(method):
    """All three solver profiles (`graph_optimizer.h:181-186`) correct the
    drift and pass the wrong-edge veto."""
    be, gt = _mini_backend(method)
    poses = be.optimize()
    assert poses is not None, "PGO rejected"
    err = np.linalg.norm(poses[:, :3, 3] - gt, axis=1)
    assert err[-1] < 0.35, err  # loop edge pulls the end node home
    assert all(s.stable for s in be.submaps)


def test_gtsam_backend_at_dense_breaking_scale():
    """The gtsam selection is an iSAM-class solver (matrix-free GN +
    edge-local preconditioned CG, `pgo.optimize_and_check_cg`), not a
    profile of the dense factorization — prove it solves a 600-node
    drifted loop where the graph grew past the dense comfort zone, and
    that it agrees with the dense solver on the same graph."""
    import jax.numpy as jnp
    from mulls_tpu.backend.pgo import (PoseGraph, optimize_and_check_cg,
                                       optimize_pose_graph)
    rng = np.random.default_rng(3)
    m = 600
    ang = np.linspace(0, 2 * np.pi, m)
    gt_t = np.stack([80 * np.cos(ang), 80 * np.sin(ang),
                     np.zeros(m)], -1).astype(np.float32)
    noise = gt_t + np.concatenate(
        [[np.zeros(3)],
         np.cumsum(0.03 * rng.normal(size=(m - 1, 3)), 0)]).astype(np.float32)
    nq = np.zeros((m, 4), np.float32)
    nq[:, 0] = 1.0
    ei = list(range(m - 1)) + [0, 100, 200]
    ej = list(range(1, m)) + [m - 1, 400, 500]
    et = [noise[i + 1] - noise[i] for i in range(m - 1)] + [
        gt_t[m - 1] - gt_t[0], gt_t[400] - gt_t[100],
        gt_t[500] - gt_t[200]]
    E = len(ei)
    eq = np.zeros((E, 4), np.float32)
    eq[:, 0] = 1.0
    graph = PoseGraph(
        node_t=jnp.asarray(noise), node_q=jnp.asarray(nq),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_t=jnp.asarray(np.stack(et)), edge_q=jnp.asarray(eq),
        edge_info=jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32),
                                   (E, 6, 6)),
        edge_mask=jnp.ones(E, bool),
        fixed=jnp.asarray([True] + [False] * (m - 1)))
    packed = np.asarray(optimize_and_check_cg(graph, iterations=20,
                                              cg_iters=300))
    t_cg = packed[:3 * m].reshape(m, 3)
    chi_cg = packed[7 * m]
    bad = packed[7 * m + 1:] > 0.5
    assert not bad.any()
    # the solve must reach the problem's cost floor (the residual error
    # vs gt is inherent: 3 loop anchors over 600 noisy chain edges leave
    # mid-chain drift both solvers keep)
    assert chi_cg < 1e-3, chi_cg
    err_before = np.linalg.norm(noise - gt_t, axis=1).max()
    err_cg = np.linalg.norm(t_cg - gt_t, axis=1).max()
    assert err_cg < 0.85 * err_before, (err_before, err_cg)
    t_d, _, chi_d = optimize_pose_graph(graph, iterations=20)
    err_d = np.linalg.norm(np.asarray(t_d) - gt_t, axis=1).max()
    assert err_cg < err_d + 0.2, (err_cg, err_d)
    assert chi_cg < 100.0 * max(float(chi_d), 1e-6)


def test_drift_window_accept_logic():
    """Round-4 drift-aware loop-edge acceptance (`_drift_window_accept`):
    within-window results pass untouched; an out-of-window result is
    retried from the odometry prediction; the BEV arbiter only engages
    when allowed and its acceptances are flagged via_bev."""
    from mulls_tpu.config import MullsConfig
    from mulls_tpu.backend.submap import SlamBackend, Submap

    cfg = MullsConfig()
    be = SlamBackend(cfg)
    a = Submap(sid=0, pose=np.eye(4), clouds=None, descriptors=None,
               frame_begin=0, frame_end=0)
    b = Submap(sid=1, pose=np.eye(4), clouds=None, descriptors=None,
               frame_begin=1, frame_end=1)
    b.pose = np.eye(4)
    b.pose[0, 3] = 10.0  # odometry prediction: 10 m ahead

    def fake_pair_reg(old, bb, Tg, max_iter=None):
        # the odometry-guess retry converges to the true transform
        T = np.eye(4)
        T[0, 3] = 10.1
        return {"T": T, "sigma": 0.03, "code": 1, "confidence": 0.5,
                "iterations": 5, "info": np.eye(6)}

    be._pair_reg = fake_pair_reg
    be._bev_of = lambda *_: (np.eye(4), False)

    T_good = np.eye(4)
    T_good[0, 3] = 10.2  # 0.2 m from prediction: inside any window
    d = {"T": T_good, "sigma": 0.04, "code": 1, "confidence": 0.4,
         "iterations": 5, "info": np.eye(6)}
    out, ok, via_bev = be._drift_window_accept(a, b, d, (1.0, 5.0))
    assert ok and not via_bev and out is d

    T_alias = np.eye(4)
    T_alias[0, 3] = 12.5  # 2.5 m off: outside a 1.0 m window
    d2 = {"T": T_alias, "sigma": 0.04, "code": 1, "confidence": 0.4,
          "iterations": 5, "info": np.eye(6)}
    out, ok, via_bev = be._drift_window_accept(a, b, d2, (1.0, 5.0))
    assert ok and not via_bev
    assert abs(out["T"][0, 3] - 10.1) < 1e-9  # the retry's result won

    # retry ALSO aliased: without BEV confirmation the edge is rejected
    def bad_pair_reg(old, bb, Tg, max_iter=None):
        return dict(d2)

    be._pair_reg = bad_pair_reg
    out, ok, via_bev = be._drift_window_accept(a, b, d2, (1.0, 5.0))
    assert not ok

    # BEV agrees with the out-of-window result -> accepted via_bev
    T_bev = np.eye(4)
    T_bev[0, 3] = 12.4
    be._bev_of = lambda *_: (T_bev, True)
    out, ok, via_bev = be._drift_window_accept(a, b, d2, (1.0, 5.0))
    assert ok and via_bev

    # ...but not when the prior was re-confirmed (allow_bev=False)
    out, ok, via_bev = be._drift_window_accept(a, b, d2, (1.0, 5.0),
                                               allow_bev=False)
    assert not ok


def test_g2o_sparse_solver_at_scale_and_parity():
    """The g2o selection is a genuinely SPARSE direct solver
    (`backend/sparse_pgo.py`: block-CSC Hessian + per-iteration sparse LU,
    anchors eliminated — the architecture of g2o LM+CHOLMOD,
    `graph_optimizer.cpp:143-384`), not a profile of the dense path.
    Prove it solves the same 600-node drifted loop the gtsam test uses,
    agrees with the dense solver, and hard-eliminates fixed nodes."""
    from mulls_tpu.backend.pgo import PoseGraph, optimize_pose_graph
    from mulls_tpu.backend.sparse_pgo import optimize_pose_graph_sparse
    rng = np.random.default_rng(3)
    m = 600
    ang = np.linspace(0, 2 * np.pi, m)
    gt_t = np.stack([80 * np.cos(ang), 80 * np.sin(ang),
                     np.zeros(m)], -1).astype(np.float32)
    noise = gt_t + np.concatenate(
        [[np.zeros(3)],
         np.cumsum(0.03 * rng.normal(size=(m - 1, 3)), 0)]).astype(np.float32)
    nq = np.zeros((m, 4), np.float32)
    nq[:, 0] = 1.0
    ei = np.asarray(list(range(m - 1)) + [0, 100, 200])
    ej = np.asarray(list(range(1, m)) + [m - 1, 400, 500])
    et = np.stack([noise[i + 1] - noise[i] for i in range(m - 1)] + [
        gt_t[m - 1] - gt_t[0], gt_t[400] - gt_t[100],
        gt_t[500] - gt_t[200]])
    E = len(ei)
    eq = np.zeros((E, 4), np.float32)
    eq[:, 0] = 1.0
    info = np.broadcast_to(np.eye(6, dtype=np.float32), (E, 6, 6))
    fixed = np.asarray([True] + [False] * (m - 1))

    t_s, q_s, chi_s = optimize_pose_graph_sparse(
        noise, nq, ei, ej, et, eq, info, fixed, iterations=20,
        robust_kernel=False)
    # anchor eliminated, not merely pinned: bitwise untouched
    np.testing.assert_array_equal(t_s[0], noise[0].astype(np.float64))
    assert chi_s < 1e-3, chi_s
    err_before = np.linalg.norm(noise - gt_t, axis=1).max()
    err_s = np.linalg.norm(t_s - gt_t, axis=1).max()
    assert err_s < 0.85 * err_before, (err_before, err_s)
    # parity with the dense device solver on the same graph
    graph = PoseGraph(
        node_t=jnp.asarray(noise), node_q=jnp.asarray(nq),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_t=jnp.asarray(et), edge_q=jnp.asarray(eq),
        edge_info=jnp.asarray(info), edge_mask=jnp.ones(E, bool),
        fixed=jnp.asarray(fixed))
    t_d, _, chi_d = optimize_pose_graph(graph, iterations=20)
    err_d = np.linalg.norm(np.asarray(t_d) - gt_t, axis=1).max()
    assert err_s < err_d + 0.2, (err_s, err_d)


def test_g2o_sparse_huber_rejects_gross_outlier():
    """Huber IRLS (g2o RobustKernelHuber parity): a gross SHORT-range
    false edge must not drag the solution when a correct loop edge
    anchors the trajectory; the quadratic solve without the kernel is
    dragged.  (A LONG-range lone false edge is deliberately not used:
    with weak rotation evidence a whole-chain arc satisfies it almost
    for free — that measures gauge freedom, not robustness.)"""
    from mulls_tpu.backend.sparse_pgo import optimize_pose_graph_sparse
    rng = np.random.default_rng(7)
    m = 40
    gt_t = np.stack([np.arange(m, dtype=np.float64), np.zeros(m),
                     np.zeros(m)], -1)
    nq = np.zeros((m, 4)); nq[:, 0] = 1.0
    noise = gt_t + np.concatenate(
        [[np.zeros(3)], np.cumsum(0.02 * rng.normal(size=(m - 1, 3)), 0)])
    # chain + CORRECT loop edge (0 -> m-1) + gross false edge 10 -> 15
    ei = np.asarray(list(range(m - 1)) + [0, 10])
    ej = np.asarray(list(range(1, m)) + [m - 1, 15])
    et = np.stack([noise[i + 1] - noise[i] for i in range(m - 1)]
                  + [gt_t[m - 1] - gt_t[0],
                     gt_t[15] - gt_t[10] + np.asarray([0.0, 30.0, 0.0])])
    E = len(ei)
    eq = np.zeros((E, 4)); eq[:, 0] = 1.0
    info = np.tile(np.eye(6) * 100.0, (E, 1, 1))
    info[-1] = np.eye(6)  # the false edge carries ordinary loop weight
    fixed = np.asarray([True] + [False] * (m - 1))
    t_r, _, _ = optimize_pose_graph_sparse(
        noise, nq, ei, ej, et, eq, info, fixed, iterations=25,
        robust_kernel=True, huber_delta=1.0)
    t_q, _, _ = optimize_pose_graph_sparse(
        noise, nq, ei, ej, et, eq, info, fixed, iterations=25,
        robust_kernel=False)
    pull_r = abs(t_r[15][1] - gt_t[15][1])
    pull_q = abs(t_q[15][1] - gt_t[15][1])
    assert pull_r < 0.5, pull_r          # robust: outlier down-weighted
    assert pull_q > 2.0 * pull_r, (pull_q, pull_r)  # quadratic: dragged
