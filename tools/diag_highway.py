"""Decompose highway odometry drift by DOF: per-frame yaw/pitch/roll and
along/cross-track position error vs ground truth, plus per-frame feature
counts — run on the same world/protocol as the accuracy matrix highway
rows.  Identifies WHICH degree of freedom accumulates error in the
sparse-geometry regime (guardrails + posts only).

Usage: python tools/diag_highway.py [--fog] [--seed 7] [--frames 420]
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)

import numpy as np

from mulls_tpu.config import load_flagfile
from synthetic_accuracy_bench import (build_world_highway,
                                      highway_trajectory, simulate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--frames", type=int, default=420)
    ap.add_argument("--fog", action="store_true")
    ap.add_argument("--config", default="/root/reference/script/config/"
                    "lo_gflag_list_kitti_highway.txt")
    ap.add_argument("--road_z_noise", type=float, default=0.03,
                    help="road surface z noise (theory probe: the min-z "
                         "grid selection bias scales with it)")
    args = ap.parse_args()

    cfg = load_flagfile(args.config)
    rng = np.random.default_rng(args.seed)
    world = build_world_highway(rng, road_z_noise=args.road_z_noise)
    world_g = highway_trajectory(args.frames)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
    fog_lo, fog_hi = ((int(0.25 * args.frames), int(0.40 * args.frames))
                      if args.fog else (0, 0))

    v_err = (cfg.preprocess.vertical_ang_correction_deg
             if (cfg.preprocess.vertical_ang_calib_on
                 and 0.0 < cfg.preprocess.vertical_ang_correction_deg
                 < 180.0) else 0.0)
    frames = [simulate(world, world_g[k], cfg.shapes.n_raw, rng,
                       sensor_range=(20.0 if fog_lo <= k < fog_hi else 65.0),
                       vertical_ang_err_deg=v_err)
              for k in range(args.frames)]

    from mulls_tpu.pipeline.odometry import OdometryPipeline
    res = OdometryPipeline(cfg).run(frames)

    # error decomposition in the GT body frame
    print("frame |  along  cross    z  | yaw_deg pitch_deg roll_deg | code")
    for k in range(0, args.frames, 20):
        dT = np.linalg.inv(gt[k]) @ res.poses[k]
        t = dT[:3, 3]
        R = dT[:3, :3]
        yaw = np.degrees(np.arctan2(R[1, 0], R[0, 0]))
        pitch = np.degrees(np.arcsin(np.clip(-R[2, 0], -1, 1)))
        roll = np.degrees(np.arctan2(R[2, 1], R[2, 2]))
        print(f"{k:5d} | {t[0]:7.2f} {t[1]:6.2f} {t[2]:5.2f} | "
              f"{yaw:7.3f} {pitch:8.3f} {roll:8.3f} | {res.codes[k]}")
    k = args.frames - 1
    dT = np.linalg.inv(gt[k]) @ res.poses[k]
    print(f"final | {dT[0, 3]:7.2f} {dT[1, 3]:6.2f} {dT[2, 3]:5.2f}")
    bad = [i for i, c in enumerate(res.codes) if c != 1]
    print("non-1 codes:", bad[:40])

    # per-frame relative yaw error (where does the yaw bias come from?)
    rel_err = []
    for k in range(1, args.frames):
        T_rel_gt = np.linalg.inv(gt[k - 1]) @ gt[k]
        T_rel = np.linalg.inv(res.poses[k - 1]) @ res.poses[k]
        d = np.linalg.inv(T_rel_gt) @ T_rel
        rel_err.append([d[0, 3], d[1, 3], d[2, 3],
                        np.degrees(np.arctan2(d[1, 0], d[0, 0]))])
    rel = np.asarray(rel_err)
    print("per-frame rel err mean [dx dy dz dyaw_deg]:",
          np.round(rel.mean(0), 5).tolist())
    print("per-frame rel err std:", np.round(rel.std(0), 5).tolist())
    # windowed means to see where bias lives
    for lo in range(0, args.frames - 1, 60):
        hi = min(lo + 60, args.frames - 1)
        print(f"  frames {lo:3d}-{hi:3d}: mean dyaw "
              f"{rel[lo:hi, 3].mean():+.5f} deg, mean dx "
              f"{rel[lo:hi, 0].mean():+.5f}, mean dy "
              f"{rel[lo:hi, 1].mean():+.5f}")


if __name__ == "__main__":
    main()
