"""Motion-compensation A/B: quantify pre- vs post-registration
undistortion on a high-yaw-rate spinning-scan synthetic (VERDICT item 4).

The simulator renders each point from the sensor pose interpolated along
the intra-frame motion at the point's azimuth sweep ratio — i.e. honestly
rolling-shutter-distorted scans with exact per-point timestamps.  The
trajectory corners hard (~15 deg/frame yaw) — exactly the regime where the
motion-model PREDICTION used by timing="pre" is most wrong and the
reference's post-registration compensation (`mulls_slam.cpp:704-715`)
should win.

Usage: python tools/motion_comp_ab.py [--frames 40] [--json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/tmp/jax_cpu_cache" if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu"
    else "/tmp/jax_cache")

import numpy as np


def small_cfg():
    from mulls_tpu.config import (MullsConfig, ShapeConfig, FeatureConfig,
                                  MapConfig, MapShapeConfig)
    return MullsConfig(
        shapes=ShapeConfig(n_raw=16384, n_unground=8192, n_ground_full=1024,
                           n_pillar_full=512, n_beam_full=512,
                           n_facade_full=1024, n_roof_full=256,
                           n_vertex_full=512, grid_dim=64),
        feature=FeatureConfig(ground_down_fixed_num=256,
                              pillar_down_fixed_num=128,
                              facade_down_fixed_num=256,
                              beam_down_fixed_num=64,
                              roof_down_fixed_num=64,
                              unground_down_fixed_num=2048,
                              vertex_keep_num=128),
        map=MapConfig(shapes=MapShapeConfig(ground=1024, pillar=256,
                                            beam=256, facade=1024, roof=128,
                                            vertex=256)),
    )


def make_world(rng, n=90000, extent=40.0):
    n_g = n // 2
    g = np.stack([rng.uniform(-extent, extent, n_g),
                  rng.uniform(-extent, extent, n_g),
                  0.03 * rng.normal(size=n_g) - 1.7], -1)
    n_w = n // 4
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


def interp_pose(Ta, Tb, s):
    """Geodesic interpolation between two poses at ratio s (slerp R via
    axis-angle of the relative rotation, lerp t)."""
    from scipy.spatial.transform import Rotation, Slerp  # noqa
    raise RuntimeError("unused")


def _pose_interp(Ta, Tb, s):
    rel = np.linalg.inv(Ta) @ Tb
    # axis-angle fraction of the relative rotation
    R = rel[:3, :3]
    cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
    ang = np.arccos(cos)
    if ang < 1e-9:
        Rs = np.eye(3)
    else:
        axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]]) / (2 * np.sin(ang))
        a = ang * s
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        Rs = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
    out = np.eye(4)
    out[:3, :3] = Rs
    out[:3, 3] = s * rel[:3, 3]
    return Ta @ out


def render_distorted(world, Ta, Tb, n_raw, sensor_range, rng):
    """Rolling-shutter scan: each point rendered from the pose interpolated
    at its azimuth sweep ratio (clockwise from +x at sweep start)."""
    inv = np.linalg.inv(Ta)
    local0 = world @ inv[:3, :3].T + inv[:3, 3]
    r = np.linalg.norm(local0[:, :2], axis=1)
    sel = np.where((r < sensor_range) & (r > 1.5))[0]
    if len(sel) > n_raw:
        sel = rng.choice(sel, n_raw, replace=False)
    az = np.arctan2(local0[sel, 1], local0[sel, 0])
    s = np.mod(-az, 2 * np.pi) / (2 * np.pi)  # clockwise sweep from +x
    # render each point from its interpolated pose (bucketed for speed)
    n_buckets = 64
    bucket = np.minimum((s * n_buckets).astype(int), n_buckets - 1)
    pts = np.zeros((len(sel), 3), np.float32)
    for b in range(n_buckets):
        m = bucket == b
        if not m.any():
            continue
        sb = (b + 0.5) / n_buckets
        P = _pose_interp(Ta, Tb, sb)
        invP = np.linalg.inv(P)
        pts[m] = (world[sel][m] @ invP[:3, :3].T + invP[:3, 3])
    pts += 0.008 * rng.normal(size=pts.shape).astype(np.float32)
    out_xyz = np.zeros((n_raw, 3), np.float32)
    out_xyz[:len(sel)] = pts
    mask = np.zeros(n_raw, bool)
    mask[:len(sel)] = True
    inten = np.zeros(n_raw, np.float32)
    wsel = world[sel]
    inten[:len(sel)] = (np.abs(np.sin(0.7 * wsel[:, 0])
                               + np.cos(1.3 * wsel[:, 1])) * 120.0)
    ts = np.zeros(n_raw, np.float32)
    ts[:len(sel)] = s.astype(np.float32)
    return {"xyz": out_xyz, "intensity": inten, "ts_ratio": ts,
            "mask": mask}


def gt_trajectory(n_frames, yaw_per_frame_deg=8.0, step=0.8):
    """Warm-up straight leg (the motion model needs history, like the
    reference's initial frames), then sustained hard cornering with sign
    flips — intra-frame rotation is the distortion source."""
    gt = [np.eye(4)]
    yaw = 0.0
    warm = 6
    for k in range(1, n_frames):
        if k <= warm:
            yaw_rate = 0.0
        else:
            yaw_rate = (np.radians(yaw_per_frame_deg)
                        * np.sign(np.sin(0.25 * (k - warm))))
        yaw += yaw_rate
        T = gt[-1].copy()
        d = np.array([np.cos(yaw), np.sin(yaw), 0.0]) * step
        T = T.copy()
        T[:3, 3] = gt[-1][:3, 3] + d
        R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                      [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        T[:3, :3] = R
        gt.append(T)
    return gt


def run_mode(cfg, frames, label):
    from mulls_tpu.pipeline.odometry import OdometryPipeline

    class _DS(list):
        pass

    res = OdometryPipeline(cfg, segment=4).run(_DS(frames))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--yaw", type=float, default=15.0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import dataclasses
    rng = np.random.default_rng(7)
    world = make_world(rng, n=120000, extent=45.0)
    gt = gt_trajectory(args.frames, args.yaw)
    frames = []
    for k in range(len(gt)):
        Tb = gt[k + 1] if k + 1 < len(gt) else gt[k]
        frames.append(render_distorted(world, gt[k], Tb, 16384, 35.0, rng))

    import dataclasses as _dc
    base = small_cfg()
    base = _dc.replace(base, reg=_dc.replace(
        base.reg, corr_dis_thre_init=3.5, corr_dis_thre_min=0.6))
    modes = {
        "off": dataclasses.replace(
            base, map=dataclasses.replace(base.map,
                                          motion_compensation_method=0)),
        "pre (prediction)": dataclasses.replace(
            base, map=dataclasses.replace(base.map,
                                          motion_compensation_method=1,
                                          motion_compensation_timing="pre")),
        "post (measured, ref)": dataclasses.replace(
            base, map=dataclasses.replace(base.map,
                                          motion_compensation_method=1,
                                          motion_compensation_timing="post")),
    }
    gtn = np.stack(gt)
    path_len = np.sum(np.linalg.norm(np.diff(gtn[:, :3, 3], axis=0), axis=1))
    out = {}
    for name, cfg in modes.items():
        res = run_mode(cfg, frames, name)
        err = np.linalg.norm(res.poses[:, :3, 3] - gtn[:, :3, 3], axis=1)
        ok = all(c == 1 for c in res.codes)
        out[name] = {
            "ate_rmse_m": float(np.sqrt(np.mean(err ** 2))),
            "end_drift_m": float(err[-1]),
            "end_drift_pct": float(100.0 * err[-1] / path_len),
            "codes_ok": bool(ok),
        }
        print(f"{name:22s} ATE {out[name]['ate_rmse_m']:.3f} m  "
              f"end {out[name]['end_drift_m']:.3f} m "
              f"({out[name]['end_drift_pct']:.2f}%)  ok={ok}", flush=True)
        if not ok:
            print(f"  codes: {res.codes}", flush=True)
    if args.json:
        print(json.dumps({"path_len_m": float(path_len), "modes": out}))


if __name__ == "__main__":
    main()
