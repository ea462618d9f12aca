"""Isolate the highway per-frame pitch bias (-0.0117 deg/frame) by flag
ablation: run short highway segments with one knob changed at a time and
report the mean per-frame relative pitch error.

Usage: python tools/diag_highway_ablate.py [--frames 60]
"""

from __future__ import annotations

import argparse
import dataclasses
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


def run_variant(name, cfg, frames_data, gt):
    from mulls_tpu.pipeline.odometry import OdometryPipeline
    res = OdometryPipeline(cfg).run(frames_data)
    n = len(frames_data)
    rel = []
    for k in range(5, n):  # skip warm-up
        T_rel_gt = np.linalg.inv(gt[k - 1]) @ gt[k]
        T_rel = np.linalg.inv(res.poses[k - 1]) @ res.poses[k]
        d = np.linalg.inv(T_rel_gt) @ T_rel
        pitch = np.degrees(np.arcsin(np.clip(-d[2, 0], -1, 1)))
        rel.append([pitch, d[0, 3], d[2, 3]])
    rel = np.asarray(rel)
    codes_bad = sum(1 for c in res.codes if c != 1)
    print(f"{name:42s} pitch {rel[:, 0].mean():+.5f} deg/frame  "
          f"dx {rel[:, 1].mean():+.5f}  dz {rel[:, 2].mean():+.5f}  "
          f"bad={codes_bad}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()
    base = load_flagfile("/root/reference/script/config/"
                         "lo_gflag_list_kitti_highway.txt")
    rng = np.random.default_rng(7)
    world = build_world_highway(rng)
    world_g = highway_trajectory(args.frames)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
    v_err = (base.preprocess.vertical_ang_correction_deg
             if base.preprocess.vertical_ang_calib_on else 0.0)
    frames = [simulate(world, world_g[k], base.shapes.n_raw, rng,
                       vertical_ang_err_deg=v_err)
              for k in range(args.frames)]

    def feat(cfg, **kw):
        return cfg.replace(feature=dataclasses.replace(cfg.feature, **kw))

    def reg(cfg, **kw):
        return cfg.replace(reg=dataclasses.replace(cfg.reg, **kw))

    def ground(cfg, **kw):
        return cfg.replace(ground=dataclasses.replace(cfg.ground, **kw))

    variants = [
        ("baseline (highway flagfile)", base),
        ("no beam features (111000)", reg(base, used_feature_type="111000")),
        ("ground normals (0,0,1) (method 0)",
         ground(base, ground_normal_method=0)),
        ("no dist-inverse sampling",
         ground(base, dist_inverse_sampling_method=0)),
        ("weights off (0000)", reg(base, corr_weight_strategy="0000")),
    ]
    for name, cfg in variants:
        try:
            run_variant(name, cfg, frames, gt)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
