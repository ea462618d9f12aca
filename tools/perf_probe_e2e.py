"""Where does the end-to-end SLAM wall time go?  Replicates bench.py's
phase-2 workload (256-frame mirrored demo playlist, loop closure ON) with
timing wrappers around every back-end device call + the IO decode path.

Usage: python tools/perf_probe_e2e.py  (TPU; ~5 min warm)
"""

from __future__ import annotations

import collections
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPANS: dict = collections.defaultdict(list)


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        SPANS[name].append(time.perf_counter() - t0)
        return out
    return wrap


def main():
    from mulls_tpu.config import load_flagfile
    from mulls_tpu.io.dataset import FolderDataset
    from mulls_tpu.pipeline.slam import SlamPipeline
    from mulls_tpu.backend import submap as sm_mod
    from mulls_tpu.backend import bank as bk

    cfg = load_flagfile(
        "/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
    cfg2 = dataclasses.replace(cfg, submap=dataclasses.replace(
        cfg.submap, loop_closure_detection_on=True,
        submap_accu_tran=1e9, submap_accu_rot=1e9,
        submap_accu_frame=32, min_submap_id_diff=3))

    ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
    order = list(range(len(ds))) + list(range(len(ds) - 2, 0, -1))
    idx_list = (order * (256 // len(order) + 1))[:256]

    class _Playlist:
        def __init__(self, ds_, idx):
            self.ds, self.idx = ds_, idx

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            t0 = time.perf_counter()
            out = self.ds[self.idx[i]]
            SPANS["io_decode"].append(time.perf_counter() - t0)
            return out

    # instrument the back-end device calls
    sm_mod.SlamBackend.on_new_submap = timed(
        "on_new_submap", sm_mod.SlamBackend.on_new_submap)
    sm_mod.SlamBackend.add_submap = timed(
        "add_submap", sm_mod.SlamBackend.add_submap)
    sm_mod.SlamBackend.optimize = timed(
        "optimize", sm_mod.SlamBackend.optimize)
    sm_mod.SlamBackend._pair_reg = timed(
        "pair_reg", sm_mod.SlamBackend._pair_reg)
    bk.loop_eval_batch = timed("loop_eval_batch", bk.loop_eval_batch)
    bk.pair_bev = timed("pair_bev", bk.pair_bev)
    bk.bank_store = timed("bank_store", bk.bank_store)

    # link health check: one tiny device round trip, timed
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    np.asarray(jnp.ones((8,)) * 2.0)
    print(f"link rtt probe: {time.perf_counter() - t0:.3f}s", flush=True)

    # warm-up exactly like the bench (boundary programs compile here)
    t0 = time.perf_counter()
    pipe_w = SlamPipeline(cfg2, segment=16)
    res_w = pipe_w.run(_Playlist(ds, idx_list[:176]), progress=True)
    pipe_w.refine(res_w)
    print(f"warmup(176f): {time.perf_counter() - t0:.1f}s", flush=True)
    for k in list(SPANS):
        SPANS[f"warm_{k}"] = SPANS.pop(k)

    pipe = SlamPipeline(cfg2, segment=16)
    pl = _Playlist(ds, idx_list)
    t0 = time.perf_counter()
    res = pipe.run(pl)
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    pipe.refine(res)
    t_ref = time.perf_counter() - t0

    print(f"\ntimed run: {t_run:.2f}s = {256/t_run:.2f} fps, "
          f"refine {t_ref:.3f}s")
    tm = res.timings
    print(f"pipeline cols: fetch_wait sum={tm[:,2].sum()/1e3:.2f}s  "
          f"backend sum={tm[:,3].sum()/1e3:.2f}s")
    for k in sorted(SPANS):
        v = SPANS[k]
        print(f"  {k:20s} n={len(v):3d} total={sum(v):7.3f}s "
              f"max={max(v):6.3f}s")
    be = res.backend
    print(f"submaps={len(be.submaps)} edges={len(be.edges)} "
          f"loop={sum(1 for e in be.edges if e.kind == 2)}")
    for e in be.events:
        print("  ev:", e)


if __name__ == "__main__":
    main()
