"""Baseline odometry pipeline: voxel downsample + NDT / VGICP scan-to-map.

Mirrors the reference's ``--baseline_reg_method=ndt|gicp`` path
(`mulls_slam.cpp:413-416, 634-639, 671-676`): feature extraction is
replaced by a plain voxel downsample, registration by the vendored
`koide_reg` baselines — here the TPU-native kernels of
:mod:`mulls_tpu.ops.baseline_reg`.

Like the main pipeline, a segment of frames is ONE device program
(`lax.scan`), the map lives on device as a fixed-capacity masked buffer in
the current frame's coordinates, and per-frame results come back as
packed vectors.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mulls_tpu.config import MullsConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import PackedRawCloud, unpack_raw
from mulls_tpu.ops import baseline_reg as br
from mulls_tpu.ops import voxel as vx
from mulls_tpu.pipeline.odometry import (OdometryResult, StepOut,
                                         prefetch_segments)


@struct.dataclass
class BaselineState:
    map_xyz: jnp.ndarray   # [M, 3] in last frame's coords
    map_mask: jnp.ndarray  # [M]
    pose: jnp.ndarray      # [4, 4]
    T_prev: jnp.ndarray    # [4, 4]
    frame_idx: jnp.ndarray
    key: jax.Array


def init_baseline_state(cfg: MullsConfig) -> BaselineState:
    m = cfg.baseline.map_budget
    return BaselineState(
        map_xyz=jnp.zeros((m, 3), jnp.float32),
        map_mask=jnp.zeros((m,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        T_prev=jnp.eye(4, dtype=jnp.float32),
        frame_idx=jnp.int32(0),
        key=jax.random.key(0),
    )


def _downsample_frame(raw, cfg: MullsConfig, key):
    b = cfg.baseline
    mask = vx.dist_filter_mask(raw.xyz, raw.mask,
                               cfg.preprocess.min_dist_used,
                               cfg.preprocess.max_dist_used)
    mask = vx.voxel_downsample_mask(raw.xyz, mask, b.voxel_down_size)
    mask = vx.random_downsample(mask, b.frame_budget, key)
    # compact into the fixed frame budget
    idx = jnp.argsort(~mask)[:b.frame_budget]
    return raw.xyz[idx], mask[idx]


def _baseline_step(state: BaselineState, raw_packed, cfg: MullsConfig):
    b = cfg.baseline
    raw = unpack_raw(raw_packed)
    key, k_ds, k_map = jax.random.split(state.key, 3)
    f_xyz, f_mask = _downsample_frame(raw, cfg, k_ds)

    first = state.frame_idx == 0
    guess = state.T_prev

    # target model from the current map (one scatter pass)
    table = br.build_voxel_table(state.map_xyz, state.map_mask,
                                 b.table_resolution,
                                 mode=("gicp" if b.method == "gicp"
                                       else "ndt"))
    if b.method == "gicp":
        s_cov = br.point_covariances(f_xyz, f_mask, b.gicp_cov_radius)
        res = br.vgicp_register(f_xyz, f_mask, s_cov, table, guess,
                                max_iter=b.max_iter)
    else:
        res = br.ndt_register(f_xyz, f_mask, table, guess,
                              max_iter=b.max_iter, direct7=b.direct7)

    ok = (res.matched > 100) & jnp.isfinite(res.fitness)
    eye = jnp.eye(4, dtype=jnp.float32)
    T_rel = jnp.where(first, eye, jnp.where(ok, res.transform, guess))
    pose = state.pose @ T_rel
    pose = pose.at[:3, :3].set(se3.orthonormalize(pose[:3, :3]))

    # map update: move map into the new frame, append, crop, rebudget
    T_inv = se3.inverse(T_rel)
    old_xyz = se3.transform_points(T_inv, state.map_xyz)
    merged = jnp.concatenate([old_xyz, f_xyz])
    m_mask = jnp.concatenate([state.map_mask, f_mask])
    rng2 = jnp.linalg.norm(merged, axis=-1)
    m_mask = m_mask & (rng2 < cfg.map.local_map_radius)
    # keep newest first on overflow (fresh scan wins ties)
    score = jnp.where(
        m_mask,
        jax.random.uniform(k_map, m_mask.shape)
        + jnp.concatenate([jnp.zeros_like(state.map_mask, jnp.float32),
                           jnp.full((f_xyz.shape[0],), 0.25)]),
        -1.0)
    _, keep_idx = jax.lax.top_k(score, b.map_budget)
    new_map = merged[keep_idx]
    new_mask = m_mask[keep_idx]

    new_state = BaselineState(map_xyz=new_map, map_mask=new_mask, pose=pose,
                              T_prev=jnp.where(first | ~ok, eye, T_rel),
                              frame_idx=state.frame_idx + 1, key=key)
    code = jnp.where(first | ok, 1, -1)
    vec = StepOut.pack_vec(T_rel, res.fitness, code,
                           res.matched / jnp.maximum(jnp.sum(f_mask), 1.0),
                           res.iterations)
    return new_state, vec


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def baseline_scan(state: BaselineState, raws: PackedRawCloud,
                  cfg: MullsConfig):
    def body(st, raw):
        return _baseline_step(st, raw, cfg)
    return jax.lax.scan(body, state, raws)


class BaselinePipeline:
    """Streaming NDT/GICP odometry driver (segment-scanned)."""

    def __init__(self, cfg: MullsConfig, segment: int = 16):
        if cfg.baseline.method not in ("ndt", "gicp"):
            raise ValueError(f"unknown baseline method "
                             f"{cfg.baseline.method!r}")
        self.cfg = cfg
        self.segment = segment

    def run(self, dataset, progress: bool = False) -> OdometryResult:
        cfg = self.cfg
        n = len(dataset)
        state = init_baseline_state(cfg)
        vec_parts: List[jnp.ndarray] = []
        done = 0
        for k, batch in prefetch_segments(
                dataset, self.segment,
                with_ts=self.cfg.map.motion_compensation_method == 1):
            state, vecs = baseline_scan(state, batch, cfg)
            vec_parts.append(vecs[:k])
            done += k
            if progress:
                print(f"[{done}/{n}] segment dispatched", flush=True)
        jax.block_until_ready(state.pose)

        # ONE D2H for the whole run (see pipeline/odometry.py)
        vecs = np.asarray(jnp.concatenate(vec_parts)) \
            if vec_parts else np.zeros((0, 16), np.float32)
        T_rels, fit, cod, _, _ = StepOut.unpack_vecs(vecs)
        poses = np.tile(np.eye(4), (n, 1, 1))
        for i in range(1, n):
            p = poses[i - 1] @ T_rels[i]
            u, _, vt = np.linalg.svd(p[:3, :3])
            p[:3, :3] = u @ vt
            poses[i] = p
        return OdometryResult(poses=poses, codes=[int(c) for c in cod],
                              sigmas=[float(s) for s in fit])
