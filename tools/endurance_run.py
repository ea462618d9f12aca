"""KITTI-scale endurance run (VERDICT r4 Next #6).

Drives the full SLAM pipeline (loop closure ON, checkpointing ON) over a
>=4,000-frame multi-lap urban drive (~3.4 km at KITTI 10 Hz frame
geometry: 0.8 m/frame, 131k-pt scans), then:

  * evaluates BOTH KITTI metric modes — odometry 100-800 m segments and
    the SLAM 400-3200 m "longer segments" that need a multi-km
    trajectory to exist at all (`odom_error_compute.h:34,107-110`);
  * logs the peak host RSS watermark, submap count, loop-edge count and
    refine time;
  * proves RESUME EQUIVALENCE: the mid-run checkpoint is kept, a second
    pipeline resumes from it in-process and finishes the drive, and the
    final trajectories are compared frame-by-frame.

Scans are generated LAZILY (a 4,200-frame precomputed list would be
~9 GB of host RAM); per-frame determinism comes from a per-index seed so
the resumed run sees bit-identical inputs.

Writes docs/ENDURANCE_r05.json.  TPU, ~20-35 min.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from synthetic_accuracy_bench import build_world, loop_trajectory, simulate


def peak_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return float(line.split()[1]) / 1024.0
    return -1.0


class LazyDrive:
    """Indexable dataset simulating each scan on demand with a
    per-index-deterministic seed (resume sees identical inputs)."""

    def __init__(self, world, poses, n_raw, seed):
        self.world = world
        self.poses = poses
        self.n_raw = n_raw
        self.seed = seed

    def __len__(self):
        return len(self.poses)

    def __getitem__(self, k):
        rng = np.random.default_rng(self.seed * 1_000_003 + k)
        return simulate(self.world, self.poses[k], self.n_raw, rng)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4200)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=os.path.join(_REPO, "docs",
                                                  "ENDURANCE_r05.json"))
    ap.add_argument("--workdir", default="/tmp/mulls_endurance")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    import dataclasses

    from mulls_tpu.config import load_flagfile
    from mulls_tpu.eval import kitti_metrics as km
    from mulls_tpu.pipeline import checkpoint as ck_mod
    from mulls_tpu.pipeline.slam import SlamPipeline

    cfg = load_flagfile("/root/reference/script/config/"
                        "lo_gflag_list_kitti_urban.txt")
    cfg = cfg.replace(submap=dataclasses.replace(
        cfg.submap, loop_closure_detection_on=True))

    rng = np.random.default_rng(args.seed)
    world = build_world(rng)
    world_g = loop_trajectory(args.frames)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
    ds = LazyDrive(world, world_g, cfg.shapes.n_raw, args.seed)
    path_len = float(np.sum(np.linalg.norm(
        np.diff(gt[:, :3, 3], axis=0), axis=1)))
    print(f"[endurance] {args.frames} frames, {path_len:.0f} m path, "
          f"{len(world):,} world pts", flush=True)

    ck_a = os.path.join(args.workdir, "run_a.ckpt")
    ck_mid = os.path.join(args.workdir, "mid.ckpt")
    for p in (ck_a, ck_mid):
        if os.path.exists(p):
            os.remove(p)

    # keep a copy of the checkpoint nearest mid-run (the resume artifact)
    half = args.frames // 2
    real_save = ck_mod.save_checkpoint
    kept = {}

    def hooked_save(path, state, frame_idx, *a, **kw):
        real_save(path, state, frame_idx, *a, **kw)
        if frame_idx >= half and "f" not in kept and path == ck_a:
            shutil.copyfile(ck_a, ck_mid)
            kept["f"] = int(frame_idx)
            print(f"[endurance] mid-run checkpoint kept at frame "
                  f"{frame_idx}", flush=True)

    ck_mod.save_checkpoint = hooked_save
    # the pipeline imports save_checkpoint lazily from the module, so the
    # hook is what it sees

    t0 = time.time()
    pipe = SlamPipeline(cfg, checkpoint_path=ck_a, checkpoint_every=8)
    res = pipe.run(ds, progress=True)
    t_run = time.time() - t0
    t1 = time.time()
    pipe.refine(res)
    t_refine = time.time() - t1
    be = res.backend
    out = {
        "frames": args.frames, "seed": args.seed,
        "path_length_m": round(path_len, 1),
        "run_s": round(t_run, 1), "refine_s": round(t_refine, 1),
        "fps": round(args.frames / t_run, 2),
        "submaps": len(be.submaps),
        "loop_edges": sum(1 for e in be.edges if e.kind == 2),
        "edges_total": len(be.edges),
        "peak_rss_mb": round(peak_rss_mb(), 1),
        "mid_checkpoint_frame": kept.get("f"),
        "checkpoint_bytes": os.path.getsize(ck_a),
    }
    # device memory stats, where the backend exposes them
    try:
        import jax
        ms = jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use"):
            if k in ms:
                out[f"device_{k}"] = int(ms[k])
    except Exception:
        pass

    def eval_mode(tag, poses, longer):
        errs = km.compute_error(gt, poses, longer_segments_on=longer)
        s = km.summarize(errs)
        out[tag] = {"t_drift_pct": s["ate_percent"],
                    "r_drift_deg_per_m": s["are_deg_per_m"],
                    "segments": s.get("num_segments", 0),
                    "end_gap_m": float(np.linalg.norm(
                        poses[-1, :3, 3] - gt[-1, :3, 3])),
                    "ate_rmse_m": km.ate_rmse(gt, poses)}
        print(f"[endurance] {tag}: {out[tag]}", flush=True)

    eval_mode("odometry_100_800", res.poses_odom, False)
    eval_mode("slam_100_800", res.poses, False)
    eval_mode("slam_400_3200", res.poses, True)
    codes = list(res.codes)
    out["failed_frames"] = sum(1 for c in codes if c not in (1, -4))
    out["vetoed_frames"] = sum(1 for c in codes if c == -4)

    # --- resume equivalence -------------------------------------------
    print(f"[endurance] resuming from frame {kept.get('f')} ...",
          flush=True)
    t2 = time.time()
    # run B continues FROM a copy so its own checkpoints cannot clobber
    # the kept mid-run artifact
    ck_b = os.path.join(args.workdir, "run_b.ckpt")
    shutil.copyfile(ck_mid, ck_b)
    pipe_b = SlamPipeline(cfg, checkpoint_path=ck_b, checkpoint_every=8)
    res_b = pipe_b.run(ds, progress=False)
    pipe_b.refine(res_b)
    out["resume_s"] = round(time.time() - t2, 1)
    d = np.linalg.norm(res_b.poses[:, :3, 3] - res.poses[:, :3, 3], axis=1)
    out["resume_max_pose_delta_m"] = round(float(d.max()), 4)
    out["resume_end_delta_m"] = round(float(d[-1]), 4)
    print(f"[endurance] resume max pose delta {d.max():.4f} m "
          f"(end {d[-1]:.4f} m)", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
