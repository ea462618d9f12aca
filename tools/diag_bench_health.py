"""Diagnose the two BENCH health findings of round 4:

A. frontend playlist codes -4 at frames ~86-90 (dynamic-suspect veto on a
   static world): dump per-frame code/sigma/confidence/T_rel around the
   unhealthy frames;
B. loop-world SLAM end gap (2.089 m) deterministically WORSE than pure
   odometry (0.138 m): rerun bench phase 3 with the backend decision log,
   per-reg-edge error vs ground truth, and per-submap pose error before
   and after the back-end.

Usage: python tools/diag_bench_health.py [--phase a|b|ab]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)

import numpy as np

from mulls_tpu.config import MullsConfig, load_flagfile
from mulls_tpu.io.dataset import FolderDataset


def phase_a(cfg, tag="A"):
    from mulls_tpu.pipeline.odometry import (init_state, prefetch_segments,
                                             slam_scan, StepOut)
    demo = "/root/reference/demo_data/pcd"
    ds = FolderDataset(demo, cfg.shapes.n_raw)
    frames = [ds[i] for i in range(len(ds))]
    order = list(range(len(frames))) + list(range(len(frames) - 2, 0, -1))
    idx_list = (order * (256 // len(order) + 1))[:256]
    playlist = [frames[i] for i in idx_list]
    state = init_state(cfg)
    parts = []
    for k, batch in prefetch_segments(playlist, 16):
        state, vecs = slam_scan(state, batch, cfg)
        parts.append(vecs[:k])
    vecs = np.concatenate([np.asarray(p) for p in parts])
    T, sig, cod, conf, iters = StepOut.unpack_vecs(vecs)
    bad = np.nonzero(cod != 1)[0]
    print(f"[{tag}] unhealthy frames: {bad.tolist()}")
    lo = max(int(bad[0]) - 6, 1) if len(bad) else 80
    hi = min((int(bad[-1]) + 6) if len(bad) else 96, 255)
    print(f"[{tag}] frame demo_idx code sigma conf iters  |t_rel|  dxyz")
    for i in range(lo, hi + 1):
        t = T[i, :3, 3]
        print(f"  {i:3d}  {idx_list[i]:2d}  {cod[i]:3d}  {sig[i]:.4f} "
              f"{conf[i]:.3f}  {iters[i]:2d}  {np.linalg.norm(t):.3f}  "
              f"{np.round(t, 3).tolist()}")


def phase_b(cfg):
    from synthetic_accuracy_bench import (build_world, loop_trajectory,
                                          simulate)
    from mulls_tpu.pipeline.slam import SlamPipeline

    cfg2 = dataclasses.replace(cfg, submap=dataclasses.replace(
        cfg.submap, loop_closure_detection_on=True,
        submap_accu_tran=30.0, submap_accu_rot=1e9, submap_accu_frame=150,
        min_submap_id_diff=MullsConfig().submap.min_submap_id_diff))
    n_frames = 650
    rng = np.random.default_rng(7)
    world = build_world(rng)
    world_g = loop_trajectory(n_frames)
    gt = np.einsum("ij,njk->nik", np.linalg.inv(world_g[0]), world_g)
    seeds = rng.integers(0, 2 ** 31, n_frames)
    v_err = (cfg.preprocess.vertical_ang_correction_deg
             if (cfg.preprocess.vertical_ang_calib_on
                 and 0.0 < cfg.preprocess.vertical_ang_correction_deg
                 < 180.0) else 0.0)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(8) as ex:
        sim = list(ex.map(
            lambda k: simulate(world, world_g[k], cfg.shapes.n_raw,
                               np.random.default_rng(seeds[k]),
                               vertical_ang_err_deg=v_err),
            range(n_frames)))

    class _L(list):
        pass

    pipe = SlamPipeline(cfg2, segment=16)
    t0 = time.perf_counter()
    res = pipe.run(_L(sim))
    print(f"[B] run {time.perf_counter() - t0:.1f}s")
    be = res.backend

    def gap(poses, i=-1):
        return float(np.linalg.norm(poses[i, :3, 3] - gt[i, :3, 3]))

    print(f"[B] PRE-refine end gap slam={gap(res.poses):.3f} "
          f"odom={gap(res.poses_odom):.3f}")
    # per-frame error profile (every 50th)
    err = np.linalg.norm(res.poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    err_o = np.linalg.norm(res.poses_odom[:, :3, 3] - gt[:, :3, 3], axis=1)
    for i in range(0, n_frames, 50):
        print(f"    frame {i:3d}: slam {err[i]:.3f}  odom {err_o[i]:.3f}")
    print(f"    frame {n_frames-1}: slam {err[-1]:.3f}  odom {err_o[-1]:.3f}")

    # submap pose error vs gt (submap pose = pose of its last frame)
    print("[B] submap pose errors vs gt (m):")
    for s in be.submaps:
        d = float(np.linalg.norm(s.pose[:3, 3] - gt[s.frame_end][:3, 3]))
        print(f"    submap {s.sid} frames {s.frame_begin}-{s.frame_end} "
              f"err {d:.3f} stable={s.stable} "
              f"span_conf {s.span_min_conf:.3f}/{s.span_mean_conf:.3f}")
    fe = {s.sid: s.frame_end for s in be.submaps}
    print("[B] edges:")
    for e in be.edges:
        T_gt = np.linalg.inv(gt[fe[e.i]]) @ gt[fe[e.j]]
        dt = float(np.linalg.norm(np.asarray(e.T)[:3, 3] - T_gt[:3, 3]))
        print(f"    {e.i}->{e.j} kind={e.kind} t_err={dt:.3f} "
              f"sigma={e.sigma:.4f} conf={e.confidence:.3f} "
              f"info_tr={float(np.trace(e.info)):.1f}")
    print("[B] backend events:")
    for ev in be.events:
        print("    " + ev)

    poses_ref = pipe.refine(res)
    print(f"[B] POST-refine end gap slam={gap(poses_ref):.3f}")
    bad = [i for i, c in enumerate(res.codes) if c != 1]
    print(f"[B] unhealthy frames: {bad}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="ab")
    args = ap.parse_args()
    cfg_path = "/root/reference/script/config/lo_gflag_list_kitti_urban.txt"
    cfg = (load_flagfile(cfg_path) if os.path.exists(cfg_path)
           else MullsConfig())
    if "a" in args.phase:
        phase_a(cfg)
        cfg_nv = dataclasses.replace(cfg, map=dataclasses.replace(
            cfg.map, dynamic_step_sanity_thre=0.0))
        phase_a(cfg_nv, tag="A-noveto")
    if "b" in args.phase:
        phase_b(cfg)


if __name__ == "__main__":
    main()
