"""Diagnose the dynamic-world seed-1009 mover-encounter cascade (frames
57-60): per-frame codes/sigma/confidence/step + error vs ground truth
through the encounter window.

Usage: python tools/diag_dynamic.py [--seed 1009] [--frames 120]
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
from synthetic_accuracy_bench import (build_world, dynamic_traffic,
                                      loop_trajectory, simulate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1009)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--lo", type=int, default=50)
    ap.add_argument("--hi", type=int, default=70)
    ap.add_argument("--config", default="/root/reference/script/config/"
                    "lo_gflag_list_kitti_urban.txt")
    args = ap.parse_args()
    cfg = load_flagfile(args.config)
    rng = np.random.default_rng(args.seed)
    world = build_world(rng)
    world_g = loop_trajectory(args.frames)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
    dyn = dynamic_traffic(rng, args.frames)
    v_err = (cfg.preprocess.vertical_ang_correction_deg
             if (cfg.preprocess.vertical_ang_calib_on
                 and 0.0 < cfg.preprocess.vertical_ang_correction_deg
                 < 180.0) else 0.0)
    frames = [simulate(np.concatenate([world, dyn[k]]), world_g[k],
                       cfg.shapes.n_raw, rng, vertical_ang_err_deg=v_err)
              for k in range(args.frames)]

    from mulls_tpu.pipeline.odometry import OdometryPipeline
    res = OdometryPipeline(cfg).run(frames)
    print("frame  code sigma  conf   |step|  step_err_m  abs_err_m")
    for k in range(args.lo, args.hi + 1):
        T_rel = np.linalg.inv(res.poses[k - 1]) @ res.poses[k]
        T_gt = np.linalg.inv(gt[k - 1]) @ gt[k]
        serr = np.linalg.norm(T_rel[:3, 3] - T_gt[:3, 3])
        aerr = np.linalg.norm(res.poses[k, :3, 3] - gt[k, :3, 3])
        print(f"{k:5d}  {res.codes[k]:4d} {res.sigmas[k]:.4f} "
              f"      {np.linalg.norm(T_rel[:3, 3]):6.3f}  {serr:9.3f}  "
              f"{aerr:8.3f}")
    bad = [i for i, c in enumerate(res.codes) if c not in (1, -4)]
    held = [i for i, c in enumerate(res.codes) if c == -4]
    print("failed:", bad, " vetoed:", held)
    # where were the movers at the encounter?
    for k in (56, 57, 58):
        pose = world_g[k]
        inv = np.linalg.inv(pose)
        close = []
        for body in np.split(dyn[k], 14):
            c = body.mean(0) @ inv[:3, :3].T + inv[:3, 3]
            r = np.linalg.norm(c[:2])
            if r < 25:
                close.append((round(r, 1), np.round(c[:2], 1).tolist()))
        print(f"frame {k}: movers within 25 m: {close}")


if __name__ == "__main__":
    main()
