"""Multi-session submap merging (`backend/merge.py`, BASELINE configs #5):
two independent SLAM runs over the same synthetic world, merged into one
globally consistent graph, plus the checkpoint -> CLI path."""

import numpy as np
import pytest

import __graft_entry__ as ge
from mulls_tpu.pipeline.slam import SlamPipeline

from test_pipeline import _ListDataset, _loop_world, _simulate_scan


def _merge_cfg():
    cfg = ge._small_cfg()
    return cfg.replace(
        submap=cfg.submap.__class__(
            loop_closure_detection_on=False,
            submap_accu_tran=1e9, submap_accu_rot=1e9, submap_accu_frame=3,
            teaser_min_inlier_count=6,
            map2map_reliable_sigma_thre=0.04,
            # 10-frame toy submaps overlap thinly: measured inter-session
            # corr ratios sit at 0.09-0.18 and wobble with compile-level
            # f32 jitter — the capability under test is edge creation +
            # joint PGO, not a production overlap gate
            map_to_map_min_cor_ratio=0.12),
        reg=cfg.reg.__class__(corr_dis_thre_init=3.5, corr_dis_thre_min=0.6,
                              # sparse synthetic scene: the cold-start
                              # frame sits right at the default gates
                              min_total_corr_num=30,
                              min_neccessary_corr_num=10))


def _session_gt(n, start, yaw, step=2.0):
    """Straight path with a speed ramp (cold-start ICP has no motion
    model yet, mirroring test_pipeline's loop trajectory)."""
    from mulls_tpu.core import se3
    import jax.numpy as jnp
    out = []
    d = np.asarray([np.cos(yaw), np.sin(yaw), 0.0])
    dist = 0.0
    for k in range(n):
        t = jnp.asarray(np.asarray(start) + dist * d, jnp.float32)
        e = jnp.asarray([0.0, 0.0, yaw], jnp.float32)
        out.append(np.asarray(se3.make_transform(t, e), np.float64))
        dist += min(step, 0.5 * (k + 1))
    return out


def _asymmetric_world(rng):
    """`_loop_world` is 180-degree self-symmetric (square walls), which
    makes cross-session alignment genuinely ambiguous — real streets are
    not (cf. the per-facade depth profiles in
    tools/synthetic_accuracy_bench.py).  Break the symmetry with two
    unique dense structures."""
    world = _loop_world(rng)
    n_a = 4000
    tower = np.stack([8.0 + rng.uniform(-1.5, 1.5, n_a),
                      -12.0 + rng.uniform(-1.5, 1.5, n_a),
                      rng.uniform(-1.5, 6.0, n_a)], -1)
    n_b = 3000
    slab = np.stack([-16.0 + rng.uniform(-6.0, 6.0, n_b),
                     14.0 + rng.uniform(-0.4, 0.4, n_b),
                     rng.uniform(-1.5, 3.5, n_b)], -1)
    return np.concatenate([world, tower.astype(np.float32),
                           slab.astype(np.float32)])


@pytest.fixture(scope="module")
def two_sessions():
    rng = np.random.default_rng(11)
    cfg = _merge_cfg()
    world = _asymmetric_world(rng)
    # session A: west->east along the street; session B: east->west,
    # laterally offset — same place, opposite heading, own frame-0 each
    gA = _session_gt(10, (-10.0, 0.0, 0.0), 0.0)
    gB = _session_gt(10, (10.0, 3.0, 0.0), np.pi)
    runs = []
    for g in (gA, gB):
        frames = _ListDataset(
            _simulate_scan(world, p, cfg.shapes.n_raw, 35.0, rng)
            for p in g)
        res = SlamPipeline(cfg, segment=2).run(frames)
        assert all(c == 1 for c in res.codes), res.codes
        runs.append(res)
    # true session-B -> session-A transform (both trajectories are in
    # their own frame-0 coordinates)
    T_true = np.linalg.inv(gA[0]) @ gB[0]
    return cfg, runs, T_true, gA, gB


def test_merge_two_sessions(two_sessions):
    cfg, runs, T_true, gA, gB = two_sessions
    from mulls_tpu.backend.merge import SessionData, merge_sessions

    sessions = [SessionData(submaps=r.backend.submaps,
                            edges=r.backend.edges, poses=r.poses,
                            name=f"s{i}") for i, r in enumerate(runs)]
    assert len(sessions[0].submaps) >= 2
    res = merge_sessions(sessions, cfg, min_votes=2)

    # recovered rigid session transform close to ground truth
    T_s = res.session_transforms[1]
    t_err = np.linalg.norm(T_s[:3, 3] - T_true[:3, 3])
    c = np.clip((np.trace(T_s[:3, :3].T @ T_true[:3, :3]) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(c))
    assert t_err < 1.0, (t_err, res.events)
    assert r_err < 5.0, (r_err, res.events)
    assert res.inter_edges >= 1, res.events

    # merged per-frame trajectories line up with the world ground truth
    # (expressed in session A's frame-0 coordinates)
    gt_B_in_A = np.einsum("ij,njk->nik", np.linalg.inv(gA[0]), np.stack(gB))
    pos_err = np.linalg.norm(res.poses[1][:, :3, 3]
                             - gt_B_in_A[:, :3, 3], axis=1)
    assert pos_err.max() < 1.0, (pos_err, res.events)
    # anchor session untouched (up to the pinned nodes' quaternion
    # round-trip through the solver)
    np.testing.assert_allclose(res.poses[0], runs[0].poses, atol=1e-6)

    # merged feature map export has points from both sessions
    from mulls_tpu.backend.merge import merged_feature_map
    xyz, cid, inten = merged_feature_map(res)
    assert len(xyz) > 1000
    assert xyz.shape == (len(cid), 3) and len(inten) == len(cid)


def _unrelated_world(rng, n=90000):
    """Disjoint geometry from `_asymmetric_world`: irregular radial walls
    + scattered towers (no square corridor, no shared structure), so any
    alignment the voting/BEV passes propose must be spurious."""
    n_g = n // 2
    g = np.stack([rng.uniform(-40, 40, n_g), rng.uniform(-40, 40, n_g),
                  0.03 * rng.normal(size=n_g) - 1.7], -1)
    segs = []
    for ang, r0, ln in ((0.4, 9.0, 14.0), (1.7, 14.0, 9.0), (2.6, 7.0, 12.0),
                        (4.1, 16.0, 10.0), (5.3, 11.0, 13.0)):
        m = n // 14
        u = rng.uniform(0, ln, m)
        d = np.asarray([np.cos(ang), np.sin(ang)])
        base = r0 * d + u[:, None] * np.asarray([-d[1], d[0]])
        segs.append(np.stack([base[:, 0] + 0.04 * rng.normal(size=m),
                              base[:, 1] + 0.04 * rng.normal(size=m),
                              rng.uniform(-1.5, 4.0, m)], -1))
    for cx, cy in ((-22.0, 8.0), (18.0, -19.0), (5.0, 24.0)):
        m = n // 20
        segs.append(np.stack([cx + rng.uniform(-1.0, 1.0, m),
                              cy + rng.uniform(-1.0, 1.0, m),
                              rng.uniform(-1.5, 5.0, m)], -1))
    return np.concatenate([g] + segs).astype(np.float32)


def test_merge_rejects_unrelated_session(two_sessions):
    """A session over genuinely disjoint geometry (non-empty, so the vote
    clustering AND the dense BEV fallback both actually run) must be
    rejected, not silently glued."""
    cfg, runs, _, _, _ = two_sessions
    from mulls_tpu.backend.merge import SessionData, merge_sessions

    rng = np.random.default_rng(23)
    world = _unrelated_world(rng)
    g = _session_gt(6, (-6.0, -3.0, 0.0), 0.3)
    frames = _ListDataset(
        _simulate_scan(world, p, cfg.shapes.n_raw, 35.0, rng) for p in g)
    far_run = SlamPipeline(cfg, segment=2).run(frames)
    assert len(far_run.backend.submaps) >= 1
    far = SessionData(submaps=far_run.backend.submaps,
                      edges=far_run.backend.edges, poses=far_run.poses,
                      name="unrelated")
    with pytest.raises(ValueError):
        merge_sessions([SessionData(submaps=runs[0].backend.submaps,
                                    edges=runs[0].backend.edges,
                                    poses=runs[0].poses), far], cfg)


def test_merge_cli_from_checkpoints(two_sessions, tmp_path):
    cfg, runs, T_true, gA, gB = two_sessions
    import jax
    from mulls_tpu.pipeline.checkpoint import save_checkpoint
    from mulls_tpu.pipeline.odometry import init_state

    paths = []
    for i, r in enumerate(runs):
        p = str(tmp_path / f"s{i}.ckpt")
        # a minimal live state stands in for the on-device carry (the
        # merger only consumes the back-end + trajectory)
        save_checkpoint(p, jax.device_get(init_state(cfg)), len(r.poses),
                        r.poses, r.poses, r.codes, r.sigmas,
                        backend=r.backend)
        paths.append(p)

    from mulls_tpu.apps.map_merge import main
    out_dir = str(tmp_path / "merged")
    html = str(tmp_path / "merged_map.html")
    # the merger must run at the sessions' operating point — pass the
    # fixture's relaxed toy-scale gates the same way a user passes the
    # run's flagfile/flags to the CLI (see _merge_cfg's rationale)
    rc = main(["--checkpoints", ",".join(paths), "--output_dir", out_dir,
               "--output_map_html", html,
               "--json_out", str(tmp_path / "merge.json"),
               "--map_to_map_min_cor_ratio=0.12",
               "--corr_dis_thre=3.5", "--corr_dis_thre_min=0.6",
               "--min_total_corr_num=30", "--min_neccessary_corr_num=10",
               "--teaser_min_inlier_count=6"])
    assert rc == 0
    import json
    import os
    r = json.load(open(tmp_path / "merge.json"))
    assert r["sessions"] == 2 and r["inter_edges"] >= 1
    assert os.path.exists(os.path.join(out_dir, "session_1_pose.txt"))
    assert os.path.getsize(html) > 10_000
