"""Multi-sequence throughput-scaling benchmark.

BASELINE.md's north star asks for frames/s at 1 chip and scaling beyond
it.  The odometry front-end is serial per trajectory (SURVEY.md §7.4#6),
so per-chip and multi-chip scaling both come from processing many
sequences at once (`parallel/multiseq.py`): this tool measures aggregate
frames/s of the fleet pipeline at S = 1, 2, 4, ... sequences sharded over
the available mesh, on synthetic city-block scans (no KITTI data ships in
this container).

Timing protocol follows docs/PERF.md's tunnel rules: datasets are
pre-simulated and pre-packed in host RAM, each configuration gets one
untimed warm-up segment (compile), and the timed run is
enqueue-to-completion with the pipeline's single end-of-run D2H.

Usage:  python tools/scaling_bench.py [--frames 48] [--seqs 1,2,4,8]
            [--platform tpu|cpu] [--json_out path]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48,
                    help="frames per sequence")
    ap.add_argument("--seqs", default="1,2,4,8",
                    help="comma-separated sequence counts to sweep")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import synthetic_accuracy_bench as sab

    import jax
    from mulls_tpu.config import MullsConfig, load_flagfile
    from mulls_tpu.parallel.mesh import make_mesh
    from mulls_tpu.parallel.multiseq import MultiSeqPipeline

    cfg_path = ("/root/reference/script/config/"
                "lo_gflag_list_kitti_urban.txt")
    cfg = (load_flagfile(cfg_path) if os.path.exists(cfg_path)
           else MullsConfig())

    sweep = [int(s) for s in args.seqs.split(",") if s]
    s_max = max(sweep)

    rng = np.random.default_rng(7)
    print(f"[scaling] building world + simulating {s_max} sequences x "
          f"{args.frames} frames ...", flush=True)
    t0 = time.time()
    world = sab.build_world(rng)
    gt = sab.loop_trajectory(args.frames)
    # same trajectory, per-sequence independent sensor noise: throughput
    # is shape-bound, content only has to keep every frame's registration
    # healthy
    datasets = [
        sab._List(sab.simulate(world, gt[k], cfg.shapes.n_raw,
                               np.random.default_rng(100 + s))
                  for k in range(args.frames))
        for s in range(s_max)
    ]
    print(f"[scaling] simulated in {time.time() - t0:.1f}s", flush=True)

    mesh = make_mesh()  # all local devices
    n_dev = int(mesh.devices.size)
    out = {"frames_per_seq": args.frames, "n_devices": n_dev,
           "device": jax.devices()[0].device_kind, "runs": []}

    base_fps = None
    base_seqs = None
    for S in sweep:
        # MultiSeqPipeline requires S to be a multiple of its mesh size;
        # for S < n_dev run on a submesh of S devices instead of skipping
        if S < n_dev:
            run_mesh = make_mesh(S)
        elif S % n_dev == 0:
            run_mesh = mesh
        else:
            print(f"[scaling] skip S={S} (not a multiple of the "
                  f"{n_dev}-device mesh)", flush=True)
            continue
        ds = datasets[:S]
        pipe = MultiSeqPipeline(cfg, run_mesh, segment=args.segment)
        # warm-up: compile the S-sequence program on a short prefix (same
        # pipe instance — its jitted scan is cached per instance)
        warm = [sab._List(d[:min(2, len(d))]) for d in ds]
        pipe.run(warm)
        t0 = time.time()
        res = pipe.run(ds)
        dt = time.time() - t0
        bad = sum(1 for r in res for c in r.codes[1:] if c != 1)
        agg = S * args.frames / dt
        if base_fps is None:
            base_fps = agg / S
            base_seqs = S
        eff = agg / (S * base_fps)
        run = {"sequences": S, "wall_s": round(dt, 2),
               "aggregate_fps": round(agg, 1),
               "per_seq_fps": round(agg / S, 1),
               # per-sequence throughput relative to the smallest run in
               # the sweep (named explicitly: the base is not always S=1)
               "efficiency_vs_base": round(eff, 3),
               "base_sequences": base_seqs,
               "unhealthy_frames": bad}
        out["runs"].append(run)
        print(f"[scaling] S={S}: {agg:.1f} fps aggregate "
              f"({agg / S:.1f}/seq, eff {eff:.2f}, "
              f"{bad} unhealthy)", flush=True)

    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
