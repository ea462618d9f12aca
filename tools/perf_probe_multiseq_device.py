"""Device-resident multi-sequence scaling probe.

The fleet mode (`parallel/multiseq.py`) scales by batching independent
trajectories per chip / across the mesh.  The streamed benchmark is
tunnel-H2D-bound in this container, so this probe measures the DEVICE
side of the scaling story in isolation: S sequences batched on the local
device(s), segment inputs pre-staged on device, 16 chained scan calls,
one final block.  Aggregate fps should grow near-linearly with S until
the chip's compute saturates; measured on the tunneled chip: 0.83 /
0.76 / 0.53 efficiency at S=2/4/8 (docs/PERF.md).

Usage: python tools/perf_probe_multiseq_device.py [--seqs 1,2,4,8]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="1,2,4,8")
    ap.add_argument("--segment", type=int, default=16)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    from mulls_tpu.config import MullsConfig, load_flagfile
    from mulls_tpu.io.dataset import FolderDataset
    from mulls_tpu.parallel.mesh import make_mesh
    from mulls_tpu.parallel.multiseq import make_multiseq_scan, stack_states
    from mulls_tpu.pipeline.odometry import init_state, prefetch_segments

    cfg_path = ("/root/reference/script/config/"
                "lo_gflag_list_kitti_urban.txt")
    cfg = (load_flagfile(cfg_path) if os.path.exists(cfg_path)
           else MullsConfig())
    # the batch operating point (MultiSeqPipeline parity): the in-frame
    # recovery ladder lowers to select under the sequence vmap and would
    # bill every sequence for both branches every frame
    import dataclasses
    cfg = cfg.replace(map=dataclasses.replace(
        cfg.map, inframe_recovery_on=False))

    demo = "/root/reference/demo_data/pcd"
    ds = FolderDataset(demo, cfg.shapes.n_raw)
    frames = [ds[i] for i in range(min(args.segment, len(ds)))]
    batch = next(b for _, b in prefetch_segments(frames, args.segment))
    jax.block_until_ready(batch.xyz_q)

    mesh = make_mesh(1) if jax.devices()[0].platform != "cpu" else make_mesh()
    results = []
    base = None
    for S in [int(s) for s in args.seqs.split(",") if s]:
        scan = make_multiseq_scan(mesh, cfg)
        states = stack_states([init_state(cfg.replace(seed=s))
                               for s in range(S)])
        raws = jax.tree.map(
            lambda x: jax.numpy.broadcast_to(x[None], (S,) + x.shape).copy(),
            batch)
        jax.block_until_ready(jax.tree.leaves(raws)[0])
        states, vecs = scan(states, raws)  # compile
        np.asarray(vecs)  # REAL completion (block lies on this backend)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            states, vecs = scan(states, raws)
        np.asarray(vecs)  # data-on-host: honest end of the timed span
        dt = time.perf_counter() - t0
        seg_ms = dt / args.iters * 1e3
        agg_fps = S * args.segment * args.iters / dt
        if base is None:
            base = agg_fps / S
        eff = agg_fps / (S * base)
        results.append({"sequences": S, "segment_ms": round(seg_ms, 3),
                        "aggregate_fps_device": round(agg_fps, 0),
                        "efficiency_vs_base": round(eff, 3)})
        print(f"[probe] S={S}: {seg_ms:.2f} ms/segment-batch, "
              f"{agg_fps:,.0f} fps aggregate (device), eff {eff:.2f}",
              flush=True)
    import json
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "runs": results}))


if __name__ == "__main__":
    main()
