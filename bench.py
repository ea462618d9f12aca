"""Benchmark suite: front-end odometry throughput + end-to-end SLAM
(front-end + submap back-end with loop closure + PGO + refine) on the
tunneled TPU.  Baseline: the reference runs real-time at the 10 Hz KITTI
scan rate on a desktop CPU (BASELINE.md), so vs_baseline = fps / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Hardening contract (round-3, after BENCH_r02 died with rc=1 and zero
output when the chip threw FailedPrecondition at the warm-up fetch):
- every phase runs in its own try/except AND its own deadline thread;
- a failed/overtime phase records a warn field and the later phases still
  run; the warm-up retries once after a backend error;
- the global watchdog prints the BEST-SO-FAR result dict (never a bare
  0.0) and hard-exits, and its deadline exceeds the sum of the per-phase
  budgets so a slow-but-healthy run is never truncated mid-phase.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback

# persist compiles across sessions: the accuracy/bench tooling warms this
# cache, so an unattended driver capture skips the 5-10 min cold compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

# phase budgets (s); global watchdog = sum + slack, kept under the
# driver's outer timeout (~2400 per .claude/skills/verify)
WARMUP_BUDGET = 420.0
FRONTEND_BUDGET = 620.0
E2E_BUDGET = 420.0
LOOP_BUDGET = 720.0  # runs the timed loop world TWICE (determinism proof)
GLOBAL_DEADLINE = WARMUP_BUDGET + FRONTEND_BUDGET + E2E_BUDGET \
    + LOOP_BUDGET + 150.0  # = 2330, under the driver's ~2400

# the one JSON line, mutated in place by the phases so the watchdog can
# always print whatever has been measured so far
OUT = {"metric": "frontend_odometry_fps", "value": 0.0,
       "unit": "frames/s", "vs_baseline": 0.0}
_DONE = threading.Event()


def _unhealthy(codes) -> str:
    """Diagnosable unhealthy-frame report: the INDICES and codes of the
    frames whose process code != 1 (a truncated full-codes dump hid WHICH
    frame failed in BENCH_r03)."""
    bad = np.nonzero(np.asarray(codes) != 1)[0]
    return ";".join(f"{i}:{int(codes[i])}" for i in bad[:24]) + \
        (f" (+{len(bad) - 24} more)" if len(bad) > 24 else "")


def _emit_and_exit():
    print(json.dumps(OUT), flush=True)
    os._exit(0)


def _watchdog():
    if not _DONE.wait(timeout=GLOBAL_DEADLINE):
        OUT["warn_global"] = "global deadline hit (wedged tunnel)"
        _emit_and_exit()


def _phase(name: str, budget: float, fn) -> bool:
    """Run ``fn`` on a daemon thread under ``budget`` seconds; record a
    warn on timeout or exception.  Returns True iff the phase completed
    cleanly.  (Daemon threads may leak on a wedged D2H — the suite always
    ends in os._exit, matching the round-2 behavior.)"""
    err: list = []

    def run():
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 — must never crash
            err.append(e)
            OUT[f"warn_{name}"] = f"{type(e).__name__}: {e}"[:300]
            traceback.print_exc()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=budget)
    if th.is_alive():
        OUT[f"warn_{name}"] = "phase deadline hit (wedged tunnel)"
        return False
    return not err


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax  # noqa: F401 — backend init inside the watchdog's scope
    from mulls_tpu.config import load_flagfile, MullsConfig
    from mulls_tpu.io.dataset import FolderDataset, pad_cloud
    from mulls_tpu.pipeline.odometry import (init_state, prefetch_segments,
                                             slam_scan)

    cfg_path = "/root/reference/script/config/lo_gflag_list_kitti_urban.txt"
    cfg = (load_flagfile(cfg_path) if os.path.exists(cfg_path)
           else MullsConfig())

    demo = "/root/reference/demo_data/pcd"
    ds = None
    if os.path.isdir(demo):
        ds = FolderDataset(demo, cfg.shapes.n_raw)
        frames = [ds[i] for i in range(len(ds))]
    else:  # synthetic fallback
        rng = np.random.default_rng(0)
        frames = [pad_cloud({"xyz": rng.uniform(-60, 60, (120000, 3))
                             .astype(np.float32)}, cfg.shapes.n_raw)
                  for _ in range(8)]

    # steady-state workload: mirror the demo scans into a longer
    # continuous-motion playlist (KITTI sequences are 1000+ frames; a
    # 16-frame run would be dominated by per-run fixed costs)
    order = list(range(len(frames))) + list(range(len(frames) - 2, 0, -1))
    idx_list = (order * (256 // len(order) + 1))[:256]
    playlist = [frames[i] for i in idx_list]

    # --- phase 0: warm-up ------------------------------------------------
    # compile the segment program AND force one result to host — on this
    # tunneled backend, block_until_ready on a never-fetched stream
    # reports enqueue completion, not compute completion, so every timed
    # pass below ends with a REAL host fetch.  One retry after a backend
    # error (BENCH_r02 died right here, unguarded).
    def warmup():
        last = None
        for attempt in range(2):
            try:
                state = init_state(cfg)
                vecs = None
                for k, batch in prefetch_segments(frames[:3], 16):
                    state, vecs = slam_scan(state, batch, cfg)
                np.asarray(vecs)
                return
            except BaseException as e:  # noqa: BLE001
                last = e
                OUT["warn_warmup_attempt"] = \
                    f"attempt {attempt}: {type(e).__name__}"
                time.sleep(15.0)
        raise last

    warm_ok = _phase("warmup", WARMUP_BUDGET, warmup)

    # --- phase 1: streamed front-end throughput --------------------------
    # upload + fused device step (feature extraction + s2m MULLS-ICP +
    # local-map update per frame) timed to data-on-host; best of 3 passes.
    # Scans are pre-staged in host RAM: this is the streamed FRONT-END
    # metric, decoupled from disk (the e2e metrics below include IO)
    def frontend():
        best = 0.0
        for _ in range(3):
            state = init_state(cfg)
            parts = []
            t0 = time.perf_counter()
            for k, batch in prefetch_segments(playlist, 16):
                state, vecs = slam_scan(state, batch, cfg)
                parts.append(vecs[:k])
            fetched = [np.asarray(p) for p in parts]  # true completion
            fps = len(playlist) / (time.perf_counter() - t0)
            best = max(best, fps)
            codes = np.concatenate(fetched)[:, 13].astype(int)
            OUT["value"] = round(best, 3)
            OUT["vs_baseline"] = round(best / 10.0, 3)
            if not np.all(codes == 1):
                OUT["warn_codes"] = _unhealthy(codes)

    if warm_ok:
        _phase("frontend", FRONTEND_BUDGET, frontend)

    if ds is None:
        _DONE.set()
        _emit_and_exit()

    # --- phase 2: end-to-end SLAM on the demo playlist -------------------
    # disk decode -> front-end -> submap back-end (loop closure + PGO) ->
    # end-of-run inner refine, 256 frames: the reference's 10 Hz claim is
    # this full loop (`mulls_slam.cpp:386-803`).  The playlist re-drives
    # an 11 m stretch, so neighboring submap ids ARE the revisits — the
    # id gap is lowered to 3 to make "loop closure ON" real here; the
    # honest at-scale loop metric is phase 3 on the synthetic loop world
    # with the DEFAULT id gap.
    import dataclasses
    from mulls_tpu.pipeline.slam import SlamPipeline

    cfg2 = dataclasses.replace(cfg, submap=dataclasses.replace(
        cfg.submap, loop_closure_detection_on=True,
        submap_accu_tran=1e9, submap_accu_rot=1e9,
        submap_accu_frame=32, min_submap_id_diff=3))

    class _Playlist:
        """Maps a mirrored drive onto the demo files; every access decodes
        from disk through the native loader — IO is part of the metric."""

        def __init__(self, ds_, idx):
            self.ds, self.idx = ds_, idx

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return self.ds[self.idx[i]]

    def e2e_demo():
        # warm-up long enough to hit a loop-closure boundary so the
        # bank programs (pair_m2m, loop_eval_batch) and the bucket-padded
        # PGO compile OUTSIDE the timed run (submaps every 32 frames, id
        # gap 3 -> first candidate at submap 4 = frame 160)
        pipe_w = SlamPipeline(cfg2, segment=16)
        res_w = pipe_w.run(_Playlist(ds, idx_list[:176]))
        pipe_w.refine(res_w)  # refine solver compile outside the timer
        # the warm-up's PGO may be skipped by the consistency gate —
        # precompile the bucket-padded solver on a throwaway 3-node graph
        # with a deliberately inconsistent loop edge
        from mulls_tpu.backend.submap import (ADJACENT_EDGE, REG_EDGE,
                                              Edge, SlamBackend, Submap)
        be_w = SlamBackend(cfg2)
        for k in range(3):
            p = np.eye(4)
            p[0, 3] = k * 10.0
            be_w.submaps.append(Submap(sid=k, pose=p, clouds=None,
                                       descriptors=None, frame_begin=k,
                                       frame_end=k))
        for k in range(2):
            T = np.eye(4)
            T[0, 3] = 10.0
            be_w.edges.append(Edge(i=k, j=k + 1, T=T, info=np.eye(6),
                                   kind=ADJACENT_EDGE))
        T = np.eye(4)
        T[0, 3] = 20.8
        be_w.edges.append(Edge(i=0, j=2, T=T, info=np.eye(6),
                               kind=REG_EDGE))
        be_w.optimize()
        pipe = SlamPipeline(cfg2, segment=16)
        pl = _Playlist(ds, idx_list)
        t0 = time.perf_counter()
        res = pipe.run(pl)
        pipe.refine(res)
        dt = time.perf_counter() - t0
        be = res.backend
        OUT["slam_e2e_fps"] = round(len(pl) / dt, 3)
        OUT["slam_e2e_vs_baseline"] = round(len(pl) / dt / 10.0, 3)
        OUT["slam_e2e_submaps"] = len(be.submaps)
        OUT["slam_e2e_loop_edges"] = sum(1 for e in be.edges
                                         if e.kind == 2)
        if not all(c == 1 for c in res.codes):
            OUT["slam_e2e_warn"] = "unhealthy codes " + _unhealthy(res.codes)

    if warm_ok:
        _phase("e2e", E2E_BUDGET, e2e_demo)

    # --- phase 3: end-to-end SLAM on the synthetic loop world ------------
    # ~226 m rectangular loop driven for 2.3 laps at DEFAULT
    # min_submap_id_diff: a same-spot revisit pair one lap apart is only
    # ~6 submap ids apart (below the default gate of 8 — the gate is sized
    # for KITTI-scale loops), so the honest default-gap loop closure needs
    # the 2-laps-apart revisit.  Loop edges here close a genuine revisit;
    # the drift improvement vs pure odometry is reported alongside the rate
    def e2e_loop():
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from synthetic_accuracy_bench import (build_world, loop_trajectory,
                                              simulate)
        n_frames = 650
        rng = np.random.default_rng(7)
        world = build_world(rng)
        world_g = loop_trajectory(n_frames)
        gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
        seeds = rng.integers(0, 2 ** 31, n_frames)
        # pre-simulate OUTSIDE the timer (a thread pool: simulate is
        # numpy, mostly GIL-released).  World sampling is scene synthesis,
        # not IO — the IO-in-metric phase is the demo-decode e2e above; a
        # first lazy-generation attempt put ~0.3 s/frame of host sampling
        # on the critical path and sank the metric to 3 fps.
        from concurrent.futures import ThreadPoolExecutor
        # the simulated sensor carries the vertical-angle intrinsic the
        # flagfile's calibration expects (synthetic_accuracy_bench.simulate)
        v_err = (cfg.preprocess.vertical_ang_correction_deg
                 if (cfg.preprocess.vertical_ang_calib_on
                     and 0.0 < cfg.preprocess.vertical_ang_correction_deg
                     < 180.0) else 0.0)
        with ThreadPoolExecutor(8) as ex:
            sim = list(ex.map(
                lambda k: simulate(world, world_g[k], cfg.shapes.n_raw,
                                   np.random.default_rng(seeds[k]),
                                   vertical_ang_err_deg=v_err),
                range(n_frames)))

        cfg3 = dataclasses.replace(cfg2, submap=dataclasses.replace(
            cfg2.submap, submap_accu_tran=30.0, submap_accu_frame=150,
            min_submap_id_diff=MullsConfig().submap.min_submap_id_diff))
        # warm-up: front-end/back-end programs for cfg3 (same HLO as cfg2
        # -> persistent-cache hits; this absorbs the retrace)
        pipe_w = SlamPipeline(cfg3, segment=16)
        res_w = pipe_w.run(type("L", (list,), {})(sim[:48]))
        pipe_w.refine(res_w)
        # the timed run executes TWICE back-to-back: with the round-4
        # deterministic one-boundary correction lag the two trajectories
        # must agree (BENCH_r03's run-to-run 2.088 m vs 0.125 m flip was
        # the thread-timing-dependent fold) — the delta is reported
        for attempt in (1, 2):
            pipe = SlamPipeline(cfg3, segment=16)
            t0 = time.perf_counter()
            res = pipe.run(type("L", (list,), {})(sim))
            pipe.refine(res)
            dt = time.perf_counter() - t0
            be = res.backend
            end_gap = float(np.linalg.norm(res.poses[-1, :3, 3]
                                           - gt[-1, :3, 3]))
            gap_odom = float(np.linalg.norm(res.poses_odom[-1, :3, 3]
                                            - gt[-1, :3, 3]))
            if attempt == 1:
                OUT["slam_loop_fps"] = round(n_frames / dt, 3)
                OUT["slam_loop_vs_baseline"] = round(n_frames / dt / 10.0,
                                                     3)
                OUT["slam_loop_edges"] = sum(1 for e in be.edges
                                             if e.kind == 2)
                OUT["slam_loop_end_gap_m"] = round(end_gap, 3)
                OUT["slam_loop_end_gap_odom_m"] = round(gap_odom, 3)
                if not all(c == 1 for c in res.codes):
                    OUT["slam_loop_warn"] = "unhealthy codes " \
                        + _unhealthy(res.codes)
            else:
                OUT["slam_loop_end_gap_run2_m"] = round(end_gap, 3)
                OUT["slam_loop_det_delta_m"] = round(
                    abs(end_gap - OUT["slam_loop_end_gap_m"]), 4)

    if warm_ok:
        _phase("loop", LOOP_BUDGET, e2e_loop)

    _DONE.set()
    _emit_and_exit()


if __name__ == "__main__":
    main()
