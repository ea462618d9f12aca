"""Drift regression on a synthetic drive: the quality gate standing in for
the KITTI seq-00 metric regression (SURVEY.md §4 — no KITTI data ships in
this container; the bundled 16-scan demo is covered by
test_pipeline.test_demo_odometry_golden_envelope)."""

import numpy as np
import pytest

import __graft_entry__ as ge
from mulls_tpu.pipeline.odometry import OdometryPipeline
from tests.test_pipeline import _ListDataset, _loop_world, _simulate_scan


def test_synthetic_drive_drift(rng):
    """S-curve drive, ~30 m: translational drift must stay well under the
    reference's ~0.5% KITTI operating point on clean synthetic data."""
    cfg = ge._small_cfg()
    world = _loop_world(rng, n=90000, extent=55.0)

    n_frames = 40
    gt = [np.eye(4)]
    heading = 0.0
    for k in range(1, n_frames):
        # gentle S-curve, 0.8 m / frame
        heading += np.radians(1.5 * np.sin(k / 6.0))
        T = gt[-1].copy()
        step = 0.8 * np.array([np.cos(heading), np.sin(heading), 0.0])
        T = T.copy()
        T[:3, 3] = gt[-1][:3, 3] + step
        R = np.array([[np.cos(heading), -np.sin(heading), 0],
                      [np.sin(heading), np.cos(heading), 0], [0, 0, 1]])
        T[:3, :3] = R
        gt.append(T)

    frames = _ListDataset(
        _simulate_scan(world, g, cfg.shapes.n_raw, 32.0, rng) for g in gt)
    res = OdometryPipeline(cfg, segment=8).run(frames)
    assert all(c == 1 for c in res.codes), res.codes

    gts = np.stack(gt)
    path_len = np.linalg.norm(np.diff(gts[:, :3, 3], axis=0),
                              axis=1).sum()
    end_err = np.linalg.norm(res.poses[-1, :3, 3] - gts[-1, :3, 3])
    drift_pct = 100.0 * end_err / path_len
    assert drift_pct < 0.5, f"drift {drift_pct:.3f}% over {path_len:.0f} m"
