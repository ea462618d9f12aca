"""Benchmark: front-end odometry throughput on the bundled 16-scan KITTI
demo (feature extraction + scan-to-map MULLS-ICP + local-map update per
frame, the reference's hot path — SURVEY.md §3.1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference runs real-time at the 10 Hz KITTI scan rate on a
desktop CPU (BASELINE.md), so vs_baseline = frames_per_second / 10.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    from mulls_tpu.config import load_flagfile, MullsConfig
    from mulls_tpu.io.dataset import FolderDataset, pad_cloud
    from mulls_tpu.pipeline.odometry import OdometryPipeline

    cfg_path = "/root/reference/script/config/lo_gflag_list_kitti_urban.txt"
    cfg = (load_flagfile(cfg_path) if os.path.exists(cfg_path)
           else MullsConfig())

    demo = "/root/reference/demo_data/pcd"
    if os.path.isdir(demo):
        ds = FolderDataset(demo, cfg.shapes.n_raw)
        frames = [ds[i] for i in range(len(ds))]
    else:  # synthetic fallback
        rng = np.random.default_rng(0)
        frames = [pad_cloud({"xyz": rng.uniform(-60, 60, (120000, 3))
                             .astype(np.float32)}, cfg.shapes.n_raw)
                  for _ in range(8)]

    pipe = OdometryPipeline(cfg)
    # warm-up pass: compiles the three per-frame programs
    pipe.run(frames[:3])

    t0 = time.perf_counter()
    reps = 3
    n_frames = 0
    for _ in range(reps):
        res = pipe.run(frames)
        n_frames += len(frames)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    ok = all(c == 1 for c in res.codes)
    out = {
        "metric": "frontend_odometry_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }
    if not ok:
        out["warn"] = f"codes={res.codes}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
