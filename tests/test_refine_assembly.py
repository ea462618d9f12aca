"""End-of-run refinement (`mulls_slam.cpp:832-931`) and map assembly
(`mulls_slam.cpp:959-1028`)."""

import numpy as np

from mulls_tpu.backend.refine import framewise_pgo, inner_submap_refine
from mulls_tpu.mapping import assembly


def _straight_poses(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = step * np.arange(n)
    return poses


def test_inner_submap_refine_redistributes_endpoint_shift():
    n = 11
    odom = _straight_poses(n)
    # the back-end moved the last frame by +0.5 in y; interior frames still
    # hold the raw odometry values
    poses = odom.copy()
    poses[-1, 1, 3] += 0.5
    refined = inner_submap_refine(poses, odom, [(0, n - 1)])
    y = refined[:, 1, 3]
    # endpoints fixed
    assert abs(y[0]) < 1e-4 and abs(y[-1] - 0.5) < 1e-4
    # interior y interpolates monotonically between 0 and 0.5
    assert np.all(np.diff(y) > -1e-4)
    assert 0.1 < y[n // 2] < 0.4
    # x spacing stays ~1
    assert np.all(np.abs(np.diff(refined[:, 0, 3]) - 1.0) < 0.1)


def test_framewise_pgo_closes_loop():
    n = 10
    odom = _straight_poses(n)
    odom[:, 0, 3] += np.linspace(0, 0.5, n)  # accumulated drift in x
    # loop edge: frame 9 is actually exactly 9.0 ahead of frame 0
    T_loop = np.eye(4)
    T_loop[0, 3] = 9.0
    out = framewise_pgo(odom, [(0, n - 1, T_loop, 100.0 * np.eye(6))])
    assert abs(out[-1, 0, 3] - 9.0) < 0.1
    assert abs(out[0, 0, 3]) < 1e-4


def test_map_assembly_and_filter(rng):
    # two "scans" of one wall observed from two poses
    wall = np.stack([np.full(4000, 5.0), rng.uniform(-5, 5, 4000),
                     rng.uniform(0, 3, 4000)], -1).astype(np.float32)
    poses = _straight_poses(2, step=0.5)
    frames = []
    for p in poses:
        inv = np.linalg.inv(p)
        local = wall @ inv[:3, :3].T + inv[:3, 3]
        frames.append({"xyz": local.astype(np.float32),
                       "mask": np.ones(len(local), bool)})
    pts = assembly.accumulate_map(frames, poses, voxel_res=0.2)
    assert len(pts) > 500
    # assembled points lie on the wall in WORLD coordinates
    assert np.abs(pts[:, 0] - 5.0).max() < 0.3

    # outlier filter removes isolated junk
    junk = np.asarray([[50.0, 50.0, 50.0]], np.float32)
    both = np.concatenate([pts, junk])
    kept = assembly.radius_outlier_filter(both, radius=1.0, min_neighbors=3)
    assert len(kept) >= len(pts) * 0.9
    assert not np.any(np.all(np.isclose(kept, junk), axis=1))

    img, extent = assembly.bev_image(pts, resolution=0.5)
    assert img.shape[0] > 5 and np.nanmax(img) <= 3.1


def test_framewise_pgo_cg_matches_dense_and_scales():
    """The matrix-free CG path (used for frame-scale graphs, n > 256) must
    agree with the dense solver on the same problem (`graph_optimizer.cpp
    :835-875` framewise option-A parity)."""
    from mulls_tpu.backend.refine import _poses_to_tq, _adjacent_edges  # noqa: F401
    n = 300  # > 256 -> CG path inside framewise_pgo
    odom = _straight_poses(n)
    odom[:, 0, 3] += np.linspace(0, 1.0, n)  # 1 m accumulated drift
    T_loop = np.eye(4)
    T_loop[0, 3] = float(n - 1)
    out_cg = framewise_pgo(odom, [(0, n - 1, T_loop, 100.0 * np.eye(6))])
    assert abs(out_cg[-1, 0, 3] - (n - 1)) < 0.15
    assert abs(out_cg[0, 0, 3]) < 1e-4
    # interior stays smooth (no CG artifacts): spacing near 1
    assert np.all(np.abs(np.diff(out_cg[:, 0, 3]) - 1.0) < 0.05)


def test_pipeline_refine_dispatches_framewise(rng):
    """--framewise_pgo_on routes SlamPipeline.refine through the
    whole-trajectory graph (`mulls_slam.cpp:835-875`) instead of the
    inner-submap interpolation."""
    import dataclasses

    from mulls_tpu.config import MullsConfig
    from mulls_tpu.backend.submap import Edge, REG_EDGE, ADJACENT_EDGE, \
        SlamBackend, Submap
    from mulls_tpu.pipeline.odometry import OdometryResult
    from mulls_tpu.pipeline.slam import SlamPipeline

    cfg = MullsConfig()
    cfg = dataclasses.replace(cfg, submap=dataclasses.replace(
        cfg.submap, framewise_pgo_on=True))
    n = 40
    odom = _straight_poses(n)
    odom[:, 1, 3] += np.linspace(0, 0.8, n)  # drift in y
    res = OdometryResult(poses=odom.copy(), codes=[1] * n,
                         sigmas=[0.05] * n,
                         timings=np.zeros((n, 4)))
    be = SlamBackend(cfg)
    for k, (lo, hi) in enumerate([(0, 19), (20, 39)]):
        be.submaps.append(Submap(sid=k, pose=odom[hi].copy(), clouds=None,
                                 descriptors=None, frame_begin=lo,
                                 frame_end=hi))
    T_adj = np.linalg.inv(odom[19]) @ odom[39]
    be.edges.append(Edge(i=0, j=1, T=T_adj, info=np.eye(6),
                         kind=ADJACENT_EDGE))
    # loop edge pinning frame 39 back to zero drift relative to frame 19
    T_loop = np.eye(4)
    T_loop[0, 3] = 20.0
    be.edges.append(Edge(i=0, j=1, T=T_loop, info=100.0 * np.eye(6),
                         kind=REG_EDGE))
    res.backend = be
    res.poses_odom = odom.copy()
    out = SlamPipeline(cfg).refine(res)
    # the framewise graph pulls frame 39 to y ~ y[19] (loop edge):
    # the drift between the two submap end frames is removed
    assert abs((out[39, 1, 3] - out[19, 1, 3])) < 0.15
    assert abs(out[0, 1, 3]) < 1e-4
