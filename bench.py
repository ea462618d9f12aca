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

# remote-TPU compiles persist across bench runs via the per-uid
# compilation cache mulls_tpu/__init__.py configures (cold fused-step
# compile on the tunneled chip is minutes; warm is seconds)


def main():
    # GLOBAL watchdog: any D2H on this tunneled backend can wedge for tens
    # of minutes (including the warm-up fetch, which no per-phase deadline
    # covers) — this script must ALWAYS print its one JSON line
    import threading as _th
    _done = _th.Event()

    def _watchdog():
        if not _done.wait(timeout=1980.0):
            print(json.dumps({
                "metric": "frontend_odometry_fps", "value": 0.0,
                "unit": "frames/s", "vs_baseline": 0.0,
                "warn": "global deadline hit (wedged tunnel)"}), flush=True)
            os._exit(0)

    _th.Thread(target=_watchdog, daemon=True).start()

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

    import jax
    import jax.numpy as jnp
    from mulls_tpu.pipeline.odometry import (StepOut, init_state,
                                             prefetch_segments, slam_scan)

    # steady-state workload: mirror the demo scans into a longer
    # continuous-motion playlist (KITTI sequences are 1000+ frames; a
    # 16-frame run would be dominated by per-run fixed costs).  Scans are
    # pre-staged in host RAM: the metric is the streamed front-end
    # throughput (pack + upload + fused device step), decoupled from this
    # container's disk (the native C++ loader covers decode separately at
    # >200 fps).
    order = list(range(len(frames))) + list(range(len(frames) - 2, 0, -1))
    idx_list = (order * (256 // len(order) + 1))[:256]
    playlist = [frames[i] for i in idx_list]

    # warm-up: compile the segment program AND force one result to host —
    # on this tunneled backend, block_until_ready on a never-fetched
    # stream reports enqueue completion, not compute completion (measured:
    # 8 chained segments "block" in 3 ms but take 30 s to actually produce
    # data), so every timed pass below ends with a REAL host fetch of the
    # result buffers
    state = init_state(cfg)
    for k, batch in prefetch_segments(frames[:3], 16):
        state, vecs = slam_scan(state, batch, cfg)
    np.asarray(vecs)

    # timed: streamed run to data-on-host; best of three passes.  The
    # per-segment result is a tiny [16,16] f32 buffer, so the end-of-pass
    # fetch adds link RTT, not bandwidth — the timer measures the honest
    # pipeline a user gets: upload + device compute + result readback
    fps = 0.0
    fetched = []

    def one_pass():
        nonlocal fetched
        state = init_state(cfg)
        parts = []
        t0 = time.perf_counter()
        for k, batch in prefetch_segments(playlist, 16):
            state, vecs = slam_scan(state, batch, cfg)
            parts.append(vecs[:k])
        fetched = [np.asarray(p) for p in parts]  # forces true completion
        return len(playlist) / (time.perf_counter() - t0)

    # the passes (including their blocking fetches) run in a worker thread
    # under a hard deadline: a wedged tunnel D2H can block for many
    # minutes, and this script must ALWAYS print its one JSON line
    import threading
    fps_samples: list = []

    def _passes():
        for _ in range(3):
            fps_samples.append(one_pass())

    th = threading.Thread(target=_passes, daemon=True)
    th.start()
    th.join(timeout=1500.0)
    fps = max(fps_samples) if fps_samples else 0.0
    codes = (np.concatenate(fetched)[:, 13].astype(int)
             if fetched else None)
    ok = codes is not None and bool(np.all(codes == 1))
    out = {
        "metric": "frontend_odometry_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }
    if th.is_alive():
        out["warn"] = (f"deadline hit after {len(fps_samples)}/3 passes "
                       "(wedged tunnel)")
    elif not ok:
        out["warn"] = f"codes={codes.tolist()}"

    # --- second metric: end-to-end SLAM (disk decode -> front-end ->
    # submap back-end with loop closure + PGO + end-of-run inner refine)
    # on a 256-frame playlist — the reference's 10 Hz claim is this full
    # loop (`mulls_slam.cpp:386-803`), loop closure ON.  Runs under its
    # own deadline so a wedged tunnel still prints the line.
    e2e: dict = {}

    def _e2e():
        import dataclasses
        from mulls_tpu.pipeline.slam import SlamPipeline
        cfg2 = dataclasses.replace(cfg, submap=dataclasses.replace(
            cfg.submap, loop_closure_detection_on=True,
            submap_accu_tran=1e9, submap_accu_rot=1e9,
            submap_accu_frame=32,
            # the playlist re-drives an 11 m stretch, so neighboring
            # submap ids ARE the revisits — the default id gap (8, sized
            # for km-scale loops) would reject every candidate and the
            # "loop closure ON" label would be hollow
            min_submap_id_diff=3))

        class _Playlist:
            """Maps a 256-frame back-and-forth drive onto the demo files;
            every access decodes from disk through the native loader —
            the IO cost is part of the metric."""

            def __init__(self, ds, idx):
                self.ds, self.idx = ds, idx

            def __len__(self):
                return len(self.idx)

            def __getitem__(self, i):
                return self.ds[self.idx[i]]

        pl = _Playlist(ds, idx_list)
        # warm-up: same protocol as the front-end metric — compile the
        # scan/backend programs and absorb the per-process tunnel startup
        # (~35 s first-touch) on a 64-frame prefix incl. one submap
        # boundary, then time a full fresh run
        SlamPipeline(cfg2, segment=16).run(_Playlist(ds, idx_list[:64]))
        pipe = SlamPipeline(cfg2, segment=16)
        t0 = time.perf_counter()
        res = pipe.run(pl)
        pipe.refine(res)
        dt = time.perf_counter() - t0
        e2e["fps"] = len(pl) / dt
        e2e["codes_ok"] = all(c == 1 for c in res.codes)
        be = getattr(res, "backend", None)
        e2e["submaps"] = len(be.submaps) if be else 0
        e2e["loop_edges"] = (sum(1 for e in be.edges if e.kind == 2)
                             if be else 0)

    if os.path.isdir(demo) and not th.is_alive():
        th2 = threading.Thread(target=_e2e, daemon=True)
        th2.start()
        th2.join(timeout=900.0)
        if "fps" in e2e:
            out["slam_e2e_fps"] = round(e2e["fps"], 3)
            out["slam_e2e_vs_baseline"] = round(e2e["fps"] / 10.0, 3)
            out["slam_e2e_submaps"] = e2e["submaps"]
            out["slam_e2e_loop_edges"] = e2e["loop_edges"]
            if not e2e["codes_ok"]:
                out["slam_e2e_warn"] = "unhealthy codes"
        else:
            out["slam_e2e_warn"] = "deadline hit (wedged tunnel)"

    _done.set()
    print(json.dumps(out), flush=True)
    if th.is_alive() or ("fps" not in e2e and os.path.isdir(demo)):
        os._exit(0)  # a wedged fetch thread would hang teardown


if __name__ == "__main__":
    main()
