"""GT-prior oracle run (VERDICT r4 Weak #5).

The prof_16 matrix row (16-beam urban, `lo_gflag_list_16.txt`) is
documented as an observability floor — but round 4 had no measured
upper bound.  This tool runs THE SAME scans through THE SAME per-frame
step with one change: the constant-velocity motion model is replaced by
the GROUND-TRUTH relative pose before every frame (a perfect prior).
Whatever drift remains is registration/observability noise on the
16-beam data itself, not motion-model or recovery error.  If the
pipeline row sits near the oracle, the row is data-limited; a large gap
would indict the implementation.

Per-frame host stepping (the prior must be overridden between frames),
so it pays one dispatch per frame; 420 frames is a few minutes on the
chip.  Writes docs/accuracy/oracle_<tag>.json.

Usage: python tools/oracle_floor.py [--beams 16] [--frames 420]
           [--config .../lo_gflag_list_16.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from synthetic_accuracy_bench import build_world, loop_trajectory, simulate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=420)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--beams", type=int, default=16)
    ap.add_argument("--config", default="/root/reference/script/config/"
                    "lo_gflag_list_16.txt")
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()
    tag = args.tag or f"prof_{args.beams}"

    import jax
    import jax.numpy as jnp
    from mulls_tpu.config import load_flagfile
    from mulls_tpu.core.cloud import pack_raw_host
    from mulls_tpu.eval import kitti_metrics as km
    from mulls_tpu.pipeline.odometry import init_state, slam_step

    cfg = load_flagfile(args.config)
    rng = np.random.default_rng(args.seed)
    world = build_world(rng)
    world_g = loop_trajectory(args.frames)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
    v_err = (cfg.preprocess.vertical_ang_correction_deg
             if (cfg.preprocess.vertical_ang_calib_on
                 and 0.0 < cfg.preprocess.vertical_ang_correction_deg
                 < 180.0) else 0.0)
    print(f"[oracle] simulating {args.frames} x {args.beams}-beam scans",
          flush=True)
    frames = [simulate(world, world_g[k], cfg.shapes.n_raw, rng,
                       beams=args.beams, vertical_ang_err_deg=v_err)
              for k in range(args.frames)]
    gt_rel = np.einsum("nij,njk->nik",
                       np.linalg.inv(gt[:-1]), gt[1:]).astype(np.float32)

    state = init_state(cfg)
    poses = np.tile(np.eye(4), (args.frames, 1, 1))
    codes = []
    step_errs = []
    t0 = time.time()
    for k in range(args.frames):
        if k > 0:
            # the oracle prior: override the constant-velocity model
            # with the true relative pose (and mark it warm)
            state = state.replace(T_prev=jnp.asarray(gt_rel[k - 1]),
                                  model_age=jnp.int32(0))
        state, out = slam_step(state, jax.device_put(
            pack_raw_host(frames[k])), cfg)
        T_rel = np.asarray(out.T_rel, np.float64)
        codes.append(int(np.asarray(out.code)))
        if k > 0:
            poses[k] = poses[k - 1] @ T_rel
            step_errs.append(float(np.linalg.norm(
                T_rel[:3, 3] - gt_rel[k - 1][:3, 3])))
        if k % 100 == 0:
            print(f"[oracle] {k}/{args.frames}", flush=True)
    wall = time.time() - t0

    errs = km.compute_error(gt, poses)
    s = km.summarize(errs)
    out = {
        "tag": tag, "frames": args.frames, "beams": args.beams,
        "config": os.path.basename(args.config),
        "oracle_t_drift_pct": s["ate_percent"],
        "oracle_r_drift_deg_per_m": s["are_deg_per_m"],
        "oracle_ate_rmse_m": km.ate_rmse(gt, poses),
        "oracle_end_gap_m": float(np.linalg.norm(
            poses[-1, :3, 3] - gt[-1, :3, 3])),
        "step_err_median_m": float(np.median(step_errs)),
        "step_err_p90_m": float(np.percentile(step_errs, 90)),
        "failed_frames": sum(1 for c in codes if c not in (1, -4)),
        "wall_s": round(wall, 1),
    }
    path = os.path.join(_REPO, "docs", "accuracy", f"oracle_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
