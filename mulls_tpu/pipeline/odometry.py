"""The LiDAR odometry loop — the `mulls_slam` front-end driver
(reference `test/mulls_slam.cpp:386-803`, call stack SURVEY.md §3.1).

TPU-native structure: the whole per-frame pipeline

    extract_features -> scan-to-map MULLS-ICP -> pose composition ->
    local-map update (incl. dynamic removal + motion-model bookkeeping)

is ONE jitted program (`slam_step`) whose state (local map, pose, previous
relative transform) lives on device and is donated between frames.  The
host loop only uploads raw scans and enqueues steps — JAX's async dispatch
pipelines upload/compute across frames, and nothing is read back until the
end of the run.  This removes the host<->device round-trip per stage that
dominates when the accelerator sits behind a network tunnel.

Failure handling follows the reference (`mulls_slam.cpp:686-693`): on a
negative registration code the frame falls back to the motion-model guess
and the next initial guess resets to identity — implemented with masked
selects on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mulls_tpu.config import MullsConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import RawCloud
from mulls_tpu.frontend.features import extract_features
from mulls_tpu.frontend.icp import mm_lls_icp
from mulls_tpu.mapping.local_map import (LocalMap, init_local_map,
                                         update_local_map)


@struct.dataclass
class SlamState:
    local_map: LocalMap
    pose: jnp.ndarray  # [4,4] f32, lidar pose of the last processed frame
    T_prev: jnp.ndarray  # [4,4] previous relative transform (motion model)
    frame_idx: jnp.ndarray  # int32
    key: jax.Array


@struct.dataclass
class StepOut:
    T_rel: jnp.ndarray  # [4,4]
    pose: jnp.ndarray  # [4,4]
    sigma: jnp.ndarray
    code: jnp.ndarray
    confidence: jnp.ndarray
    iterations: jnp.ndarray


def init_state(cfg: MullsConfig) -> SlamState:
    return SlamState(
        local_map=init_local_map(cfg.map),
        pose=jnp.eye(4, dtype=jnp.float32),
        T_prev=jnp.eye(4, dtype=jnp.float32),
        frame_idx=jnp.int32(0),
        key=jax.random.key(cfg.seed),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def slam_step(state: SlamState, raw: RawCloud, cfg: MullsConfig):
    key, k_feat, k_map = jax.random.split(state.key, 3)
    frame = extract_features(raw, cfg, k_feat)

    first = state.frame_idx == 0
    if cfg.map.initial_guess_mode == 2:
        guess = state.T_prev
    elif cfg.map.initial_guess_mode == 1:
        guess = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(state.T_prev[:3, 3])
    else:
        guess = jnp.eye(4, dtype=jnp.float32)

    res = mm_lls_icp(frame.down, state.local_map.clouds, cfg.reg, guess,
                     max_iter=cfg.reg.reg_max_iter_num_s2m)

    failed = res.process_code < 0
    eye = jnp.eye(4, dtype=jnp.float32)
    T_rel = jnp.where(first, eye, jnp.where(failed, guess, res.transform))
    T_prev_next = jnp.where(first | failed, eye, T_rel)

    pose = state.pose @ T_rel
    pose = pose.at[:3, :3].set(se3.orthonormalize(pose[:3, :3]))

    # dynamic-object gate distance scales with per-frame motion
    # (`mulls_slam.cpp:439`)
    dyn_max = jnp.maximum(1.5 * jnp.linalg.norm(T_rel[:3, 3]),
                          cfg.map.dynamic_dist_thre_min + 0.1)
    local_map = update_local_map(state.local_map, frame, T_rel, dyn_max,
                                 cfg.map, k_map)

    new_state = SlamState(local_map=local_map, pose=pose,
                          T_prev=T_prev_next,
                          frame_idx=state.frame_idx + 1, key=key)
    out = StepOut(T_rel=T_rel, pose=pose, sigma=res.sigma,
                  code=jnp.where(first, 1, res.process_code),
                  confidence=res.confidence, iterations=res.iterations)
    return new_state, out


@dataclass
class OdometryResult:
    poses: np.ndarray  # [N, 4, 4] f64, LiDAR frame, pose[0] = I
    codes: List[int] = field(default_factory=list)
    sigmas: List[float] = field(default_factory=list)
    timings: Optional[np.ndarray] = None  # [N, 4] ms (feat/map/reg/loop)


class OdometryPipeline:
    """Streaming driver: one fused device step per frame, async dispatch."""

    def __init__(self, cfg: MullsConfig):
        self.cfg = cfg

    def _to_raw(self, frame: dict) -> RawCloud:
        return RawCloud(xyz=jnp.asarray(frame["xyz"]),
                        intensity=jnp.asarray(frame["intensity"]),
                        ts_ratio=jnp.asarray(frame["ts_ratio"]),
                        mask=jnp.asarray(frame["mask"]))

    def run(self, dataset, progress: bool = False,
            profile: bool = False) -> OdometryResult:
        cfg = self.cfg
        n = len(dataset)
        state = init_state(cfg)
        outs: List[StepOut] = []
        timings = np.zeros((n, 4), np.float64) if profile else None

        for i in range(n):
            t0 = time.perf_counter()
            raw = self._to_raw(dataset[i])
            state, out = slam_step(state, raw, cfg)
            outs.append(out)
            if profile:
                jax.block_until_ready(out.pose)
                timings[i, 2] = (time.perf_counter() - t0) * 1e3
            if progress and i % 50 == 0:
                print(f"[{i}/{n}] code={int(out.code)} "
                      f"sigma={float(out.sigma):.4f}", flush=True)

        jax.block_until_ready(state.pose)

        # fetch results in chunks (relative transforms composed in f64 here)
        def fetch(get):
            parts = []
            for s in range(0, n, 256):
                parts.append(np.asarray(jnp.stack(
                    [get(o) for o in outs[s:s + 256]])))
            return np.concatenate(parts) if parts else np.zeros((0,))

        T_rels = fetch(lambda o: o.T_rel).astype(np.float64)
        codes = [int(c) for c in fetch(lambda o: o.code)]
        sigmas = [float(s) for s in fetch(lambda o: o.sigma)]
        poses = np.tile(np.eye(4), (n, 1, 1))
        for i in range(1, n):
            # re-orthonormalize in f64 to keep long compositions clean
            p = poses[i - 1] @ T_rels[i]
            u, _, vt = np.linalg.svd(p[:3, :3])
            p[:3, :3] = u @ vt
            poses[i] = p
        return OdometryResult(poses=poses, codes=codes, sigmas=sigmas,
                              timings=timings)
