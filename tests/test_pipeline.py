"""End-to-end pipeline tests: demo-data odometry golden envelope + a
synthetic loop-closure run exercising the submap back-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from mulls_tpu.config import load_flagfile
from mulls_tpu.core import se3
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.pipeline.odometry import OdometryPipeline
from mulls_tpu.pipeline.slam import SlamPipeline

DEMO = "/root/reference/demo_data/pcd"
KITTI_CFG = "/root/reference/script/config/lo_gflag_list_kitti_urban.txt"


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="demo data not mounted")
def test_demo_odometry_golden_envelope():
    """The CI-equivalent smoke test (SURVEY.md §4): all 16 demo scans,
    forward motion at the known KITTI-seq00 profile, healthy
    registrations (the reference CI runs the full 16-scan demo,
    `.github/workflows/build.yml:30-46`)."""
    cfg = load_flagfile(KITTI_CFG)
    ds = FolderDataset(DEMO, cfg.shapes.n_raw)
    res = OdometryPipeline(cfg).run(ds)
    assert all(c == 1 for c in res.codes)
    assert all(s < 0.1 for s in res.sigmas[1:])
    steps = np.diff(res.poses[:, :3, 3], axis=0)
    # forward ~0.7 m/frame, minimal lateral/vertical drift
    assert np.all(steps[:, 0] > 0.5) and np.all(steps[:, 0] < 1.0)
    assert np.all(np.abs(steps[:, 1]) < 0.1)
    assert np.all(np.abs(steps[:, 2]) < 0.1)


def _simulate_scan(world, pose, n_raw, sensor_range, rng):
    """World points within range of the pose, in the sensor frame."""
    inv = np.linalg.inv(pose)
    local = world @ inv[:3, :3].T + inv[:3, 3]
    r = np.linalg.norm(local[:, :2], axis=1)
    sel = np.where((r < sensor_range) & (r > 1.5))[0]
    if len(sel) > n_raw:
        sel = rng.choice(sel, n_raw, replace=False)
    pts = local[sel] + 0.008 * rng.normal(size=(len(sel), 3))
    out_xyz = np.zeros((n_raw, 3), np.float32)
    out_xyz[:len(sel)] = pts
    mask = np.zeros(n_raw, bool)
    mask[:len(sel)] = True
    # world-stable pseudo-intensity so NCC descriptors are informative
    inten = np.zeros(n_raw, np.float32)
    wsel = world[sel]
    inten[:len(sel)] = (np.abs(np.sin(0.7 * wsel[:, 0])
                               + np.cos(1.3 * wsel[:, 1])) * 120.0)
    return {"xyz": out_xyz,
            "intensity": inten,
            "ts_ratio": np.linspace(0, 1, n_raw, dtype=np.float32),
            "mask": mask}


def _loop_world(rng, n=120000, extent=45.0):
    """Dense structured world: ground + walls + posts over a square."""
    n_g = n // 2
    g = np.stack([rng.uniform(-extent, extent, n_g),
                  rng.uniform(-extent, extent, n_g),
                  0.03 * rng.normal(size=n_g) - 1.7], -1)
    n_w = n // 4
    # walls along a square corridor
    side = rng.integers(0, 4, n_w)
    u = rng.uniform(-extent, extent, n_w)
    d = np.full(n_w, extent * 0.7) + 0.05 * rng.normal(size=n_w)
    wx = np.where(side == 0, d, np.where(side == 1, -d, u))
    wy = np.where(side < 2, u, np.where(side == 2, d, -d))
    w = np.stack([wx, wy, rng.uniform(-1.5, 3.0, n_w)], -1)
    n_p = n - n_g - n_w
    per = 60
    cx = rng.uniform(-extent, extent, n_p // per + 1)
    cy = rng.uniform(-extent, extent, n_p // per + 1)
    reps = np.repeat(np.arange(len(cx)), per)[:n_p]
    p = np.stack([cx[reps] + 0.02 * rng.normal(size=n_p),
                  cy[reps] + 0.02 * rng.normal(size=n_p),
                  rng.uniform(-1.5, 2.0, n_p)], -1)
    return np.concatenate([g, w, p]).astype(np.float32)


class _ListDataset(list):
    pass


def test_slam_loop_closure_synthetic(rng, tmp_path):
    """Drive a circular trajectory through a synthetic world: the back-end
    must segment submaps, add adjacent edges, find a loop edge when the
    trajectory returns, and keep the trajectory consistent."""
    cfg = ge._small_cfg()
    cfg = cfg.replace(
        submap=cfg.submap.__class__(
            loop_closure_detection_on=True,
            submap_accu_tran=8.0, submap_accu_rot=1e9, submap_accu_frame=4,
            min_submap_id_diff=3, neighbor_search_dist=30.0,
            min_iou_thre=0.2, teaser_min_inlier_count=6,
            map2map_reliable_sigma_thre=0.04,
            max_used_reg_edge_per_optimization=2),
        reg=cfg.reg.__class__(corr_dis_thre_init=3.5, corr_dis_thre_min=0.6))

    world = _loop_world(rng)
    # circular loop with a speed ramp: the first steps are small (cold-start
    # ICP has no motion model yet), later steps are large but predictable
    n_frames = 26
    radius = 8.0
    gt = []
    for k in range(n_frames):
        ang = 2 * np.pi * (k / (n_frames - 1)) ** 1.5
        t = jnp.asarray([radius * np.cos(ang) - radius,
                         radius * np.sin(ang), 0.0], jnp.float32)
        e = jnp.asarray([0.0, 0.0, ang + np.pi / 2], jnp.float32)
        gt.append(np.asarray(se3.make_transform(t, e), np.float64))
    frames = _ListDataset(
        _simulate_scan(world, g, cfg.shapes.n_raw, 35.0, rng) for g in gt)

    snap_dir = str(tmp_path / "snaps")
    pipe = SlamPipeline(cfg, segment=2, snapshot_dir=snap_dir,
                        snapshot_every=2)
    res = pipe.run(frames)
    # our trajectory is expressed in frame-0 coordinates: align gt
    gt = np.stack(gt)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    assert all(c == 1 for c in res.codes), res.codes
    backend = res.backend
    assert len(backend.submaps) >= 3
    kinds = [e.kind for e in backend.edges]
    assert kinds.count(1) >= len(backend.submaps) - 1  # adjacent edges
    assert kinds.count(2) >= 1, backend.events  # at least one loop edge
    # trajectory stays near ground truth (clean synthetic world)
    err = np.linalg.norm(res.poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert err.max() < 1.0, err
    # during-run snapshots were streamed (written on a daemon thread)
    import glob
    import time as _time
    for _ in range(50):  # the writer thread may still be flushing
        snaps = glob.glob(os.path.join(snap_dir, "snapshot_*.html"))
        if snaps:
            break
        _time.sleep(0.2)
    assert snaps, "no during-run snapshot artifacts written"
    assert os.path.getsize(snaps[0]) > 10_000


@pytest.mark.parametrize("method", ["ndt", "gicp"])
def test_baseline_odometry_synthetic(rng, method):
    """NDT / VGICP baseline odometry (`--baseline_reg_method`) recovers a
    straight constant-velocity trajectory through a structured world."""
    import dataclasses
    from mulls_tpu.pipeline.baseline import BaselinePipeline

    cfg = ge._small_cfg()
    cfg = dataclasses.replace(cfg, baseline=dataclasses.replace(
        cfg.baseline, method=method, frame_budget=4096, map_budget=8192,
        table_resolution=1.8, voxel_down_size=0.5, max_iter=20))

    world = _loop_world(rng, n=60000, extent=40.0)
    n_frames = 8
    gt = []
    for k in range(n_frames):
        T = np.eye(4)
        T[0, 3] = 0.6 * k
        gt.append(T)
    frames = _ListDataset(
        _simulate_scan(world, g, cfg.shapes.n_raw, 30.0, rng) for g in gt)

    res = BaselinePipeline(cfg, segment=4).run(frames)
    assert all(c == 1 for c in res.codes), res.codes
    steps = np.diff(res.poses[:, :3, 3], axis=0)
    np.testing.assert_allclose(steps[1:, 0], 0.6, atol=0.1)
    assert np.all(np.abs(steps[1:, 1:]) < 0.1)


def test_scan_to_scan_and_zupt(rng):
    """scan_to_scan_module_on + zupt wiring: straight trajectory still
    tracked, stationary frames keep z locked."""
    import dataclasses
    cfg = ge._small_cfg()
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map, scan_to_scan_module_on=True, zupt_on=True))
    world = _loop_world(rng, n=60000, extent=40.0)
    gt = []
    for k in range(6):
        T = np.eye(4)
        T[0, 3] = 0.5 * k
        gt.append(T)
    frames = _ListDataset(
        _simulate_scan(world, g, cfg.shapes.n_raw, 30.0, rng) for g in gt)
    res = OdometryPipeline(cfg, segment=3).run(frames)
    assert all(c == 1 for c in res.codes), res.codes
    steps = np.diff(res.poses[:, :3, 3], axis=0)
    np.testing.assert_allclose(steps[1:, 0], 0.5, atol=0.05)


def test_odometry_sharp_turn_no_cascade(rng):
    """Corner-cascade regression (docs/ACCURACY.md "corner-exit failure
    anatomy"): a straight run into a sharp 6 deg/frame 90-degree turn and
    out again must not produce consecutive registration failures — the
    recovery ladder (confidence-armed add_length gate widening + dynamic-
    removal pause) has to re-converge within one frame, and heading must
    survive the turn."""
    from mulls_tpu.pipeline.odometry import OdometryPipeline
    cfg = ge._small_cfg()
    world = _loop_world(rng)
    n1, nt, n2 = 12, 15, 12  # straight, turn (90 deg / 15 fr), straight
    gt = []
    pos = np.array([-14.0, -6.0, 0.0])
    yaw = 0.0
    for k in range(n1 + nt + n2):
        e = jnp.asarray([0.0, 0.0, yaw], jnp.float32)
        t = jnp.asarray(pos, jnp.float32)
        gt.append(np.asarray(se3.make_transform(t, e), np.float64))
        step = min(0.8, 0.3 * (k + 1))
        if n1 <= k < n1 + nt:
            yaw += np.pi / 2 / nt
        pos = pos + step * np.array([np.cos(yaw), np.sin(yaw), 0.0])
    frames = _ListDataset(
        _simulate_scan(world, g, cfg.shapes.n_raw, 35.0, rng) for g in gt)
    res = OdometryPipeline(cfg, segment=2).run(frames)
    codes = list(res.codes)
    runs_of_2 = [k for k in range(len(codes) - 1)
                 if codes[k] != 1 and codes[k + 1] != 1]
    assert not runs_of_2, codes
    gt = np.stack(gt)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    err = np.linalg.norm(res.poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert err[-1] < 1.0, (err.max(), err[-1], codes)


def test_stage_timing_report_columns():
    """--timing_report_file parity (`mulls_slam.cpp:805-827`,
    `dataio.hpp:2041-2060`): the staged timing mode must fill the
    feature/map/reg columns with measured (non-zero) times."""
    import numpy as np
    cfg = ge._small_cfg()
    rng = np.random.default_rng(3)
    world = _loop_world(rng, n=40000, extent=20.0)
    frames = [_simulate_scan(world,
                             np.eye(4) + np.diag([0.0] * 4),
                             cfg.shapes.n_raw, 25.0, rng)
              for _ in range(3)]

    class _DS:
        def __len__(self):
            return len(frames)

        def __getitem__(self, i):
            return frames[i]

    res = OdometryPipeline(cfg).run(_DS(), profile=True)
    t = res.timings
    assert t.shape == (3, 4)
    assert (t[:, 0] > 0).all(), t  # feature
    assert (t[:, 1] > 0).all(), t  # map
    assert (t[:, 2] > 0).all(), t  # reg


def test_end_of_run_flush_creates_final_submap(rng):
    """The open span at end of run is flushed as a final (partial) submap
    through the regular boundary ladder (`mulls_slam.cpp:823-876`
    end-of-run post-processing) — a revisit in the last open span must be
    able to earn its loop edge."""
    import __graft_entry__ as ge

    cfg = ge._small_cfg()
    cfg = cfg.replace(submap=cfg.submap.__class__(
        loop_closure_detection_on=True,
        submap_accu_tran=1e9, submap_accu_rot=1e9, submap_accu_frame=6,
        min_submap_id_diff=99))  # no loop search: isolate the flush
    world = _loop_world(rng)
    n_frames = 16  # 2 full submaps of 6 + an open span of 4
    gt = []
    for k in range(n_frames):
        t = jnp.asarray([0.6 * k, 0.0, 0.0], jnp.float32)
        gt.append(np.asarray(se3.make_transform(
            t, jnp.zeros(3, jnp.float32)), np.float64))
    frames = _ListDataset(
        _simulate_scan(world, g, cfg.shapes.n_raw, 35.0, rng) for g in gt)
    res = SlamPipeline(cfg, segment=2).run(frames)
    be = res.backend
    # frame 0 never accumulates -> boundaries at frames 7 and 13, open
    # span 14..15 flushed as the final submap
    assert len(be.submaps) == 3, be.submaps
    assert be.submaps[-1].frame_begin == 14
    assert be.submaps[-1].frame_end == n_frames - 1
    # and carries its adjacent edge from the boundary ladder
    kinds = [e.kind for e in be.edges]
    assert kinds.count(1) == 2


def test_fractional_step_screw_interpolation():
    """`_fractional_step(T_base, T_full, 1/n)` splits the delta's rotation
    angle and translation by n (the post-blackout motion-model handoff)."""
    from mulls_tpu.pipeline.odometry import _fractional_step
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [1.0, 0, 0]
    yaw = np.radians(27.0)
    c, s = np.cos(yaw), np.sin(yaw)
    full = np.array([[c, -s, 0, 1.6], [s, c, 0, 0.9],
                     [0, 0, 1, 0.1], [0, 0, 0, 1]], np.float32)
    got = np.asarray(_fractional_step(jnp.asarray(base), jnp.asarray(full),
                                      jnp.float32(1.0 / 3.0)))
    delta = np.linalg.inv(base) @ got
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(delta[:3, :3]) - 1) / 2, -1, 1)))
    np.testing.assert_allclose(ang, 9.0, atol=0.2)   # 27/3 deg
    exp_t = (np.linalg.inv(base) @ full)[:3, 3] / 3.0
    np.testing.assert_allclose(delta[:3, 3], exp_t, atol=1e-5)
    # identity delta stays identity
    same = np.asarray(_fractional_step(jnp.asarray(base), jnp.asarray(base),
                                       jnp.float32(0.25)))
    np.testing.assert_allclose(same, base, atol=1e-5)


def test_yaw_reacquisition_recovers_rotated_blackout():
    """Round-5 rotation-tolerant re-acquisition: after a blackout the
    motion model carries a 40-deg yaw error (a dead-reckoned corner);
    the standard widened attempt cannot absorb it, the heading sweep
    re-acquires against the local map.  With the sweep disabled the same
    state stays lost."""
    import dataclasses
    from mulls_tpu.core.cloud import pack_raw_host
    from mulls_tpu.pipeline.odometry import init_state, slam_step

    cfg = ge._small_cfg()
    rng = np.random.default_rng(5)
    world = ge._make_world(5)
    # 6 stationary warm frames populate the local map, then the platform
    # "was vetoed" through a corner: the prior is rotated 40 deg while
    # the truth stays still
    state = init_state(cfg)
    raw = None
    for k in range(6):
        raw = jax.device_put(pack_raw_host(
            ge._render_scan(world, np.eye(4), cfg, rng)))
        state, out = slam_step(state, raw, cfg)
    assert int(out.code) == 1

    yaw = np.radians(40.0)
    c, s = np.cos(yaw), np.sin(yaw)
    T_bad = np.eye(4, dtype=np.float32)
    T_bad[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]

    def attempt(cfg_try, st):
        # slam_step donates its state: each attempt needs its own copy
        st = jax.tree.map(jnp.copy, st)
        st = st.replace(T_prev=jnp.asarray(T_bad),
                        model_age=jnp.int32(4),
                        add_length=jnp.float32(0.0))
        frame = jax.device_put(pack_raw_host(
            ge._render_scan(world, np.eye(4), cfg, rng)))
        st2, out2 = slam_step(st, frame, cfg_try)
        T = np.asarray(out2.T_rel, np.float64)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(T[:3, :3]) - 1) / 2, -1, 1)))
        return int(out2.code), ang, float(np.linalg.norm(T[:3, 3]))

    code_on, ang_on, tr_on = attempt(cfg, state)
    cfg_off = cfg.replace(map=dataclasses.replace(
        cfg.map, yaw_reacquire_on=False))
    code_off, ang_off, tr_off = attempt(cfg_off, state)

    # sweep on: healthy code, the solved step is near identity (the
    # 40-deg-wrong prior was corrected, truth = no motion)
    assert code_on == 1, (code_on, ang_on)
    assert ang_on < 5.0 and tr_on < 0.5, (ang_on, tr_on)
    # sweep off: either outright failure/veto, or the frame keeps most of
    # the rotation error (T_rel stays near the wrong prior)
    assert code_off != 1 or ang_off > 20.0, (code_off, ang_off)
