"""Sliding local feature map as functional fixed-capacity buffers.

Re-design of the reference MapManager (`src/map_manager.cpp:18-314`):
mutable PCL clouds + kd-trees become per-class fixed-capacity masked tensors
updated by pure functions (transform -> dynamic removal -> append -> radius
crop -> random re-budget), so the whole map update is one jitted program and
the map lives on device between frames.

The map is kept in the coordinate frame of the last appended scan (like the
reference, which re-transforms the map into the current frame each update —
keeping coordinates small also protects f32 on TPU).

Deviation: the reference re-budgets all classes proportionally against one
global cap (`map_manager.cpp:73-86`); static shapes need fixed per-class
caps (`MapShapeConfig`), sized to the same global budget at the typical
class mix.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mulls_tpu.config import MapConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import (FEATURE_NAMES, FeatureCloud, FeatureFrame,
                                  VertexDescriptors)
from mulls_tpu.ops.neighbors import nearest_neighbor

_DYNAMIC_CLASSES = ("pillar", "beam", "facade")  # `map_manager.cpp:191-215`


@struct.dataclass
class LocalMap:
    clouds: Dict[str, FeatureCloud]
    vertex_desc: VertexDescriptors


def init_local_map(map_cfg: MapConfig) -> LocalMap:
    caps = map_cfg.shapes
    clouds = {n: FeatureCloud.empty(caps.capacity(n)) for n in FEATURE_NAMES}
    return LocalMap(clouds=clouds,
                    vertex_desc=VertexDescriptors.empty(caps.capacity("vertex")))


def _dynamic_removal_mask(cloud: FeatureCloud, map_cloud: FeatureCloud,
                          center_radius: float, dist_min: float,
                          dist_max: jnp.ndarray, near_thre: float,
                          enabled: jnp.ndarray) -> jnp.ndarray:
    """Frame-side mask: drop feature points near the scanner whose 1-NN map
    distance falls in (0, near] U [dist_min, dist_max]
    (`map_manager.cpp:145-256`)."""
    _, d2 = nearest_neighbor(cloud.xyz, cloud.mask, map_cloud.xyz,
                             map_cloud.mask)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    rng = jnp.linalg.norm(cloud.xyz, axis=-1)
    in_scope = rng < center_radius
    dynamic = (d <= near_thre) | ((d >= dist_min) & (d <= dist_max))
    drop = in_scope & dynamic & enabled
    return cloud.mask & ~drop


@partial(jax.jit, static_argnames=("map_cfg",), donate_argnums=(0,))
def update_local_map(local_map: LocalMap, frame: FeatureFrame,
                     T_rel: jnp.ndarray, dynamic_dist_max: jnp.ndarray,
                     map_cfg: MapConfig, key: jax.Array,
                     removal_enabled=True, append_enabled=True) -> LocalMap:
    """Append ``frame`` (down clouds + vertex) to the map.

    ``T_rel`` maps the new frame's coords into the current map frame (the
    registration result).  The returned map lives in the new frame's coords.
    ``removal_enabled`` (may be traced) additionally gates dynamic-object
    removal — callers pass False for frames whose registration is failed or
    low-confidence: removal keys off scan-vs-map distance, so running it on
    a misaligned frame deletes STATIC structure (docs/ACCURACY.md).
    ``append_enabled`` (may be traced) gates the append itself: a failed or
    vetoed frame's pose is the motion-model GUESS, and appending its
    features forks the map into a ghost branch that later healthy
    registrations lock onto (measured: 3 corner frames ghost-appended
    during a mover encounter bent the trajectory ~15 deg permanently).
    The map still transforms/crops so its coordinates follow the pose.
    """
    caps = map_cfg.shapes
    T_inv = se3.inverse(T_rel)

    # global cap gate for dynamic removal (`map_manager.cpp:38`)
    map_count = sum(local_map.clouds[n].count
                    for n in ("ground", "pillar", "facade", "beam", "roof"))
    removal_on = (jnp.bool_(map_cfg.map_based_dynamic_removal_on)
                  & (map_count > map_cfg.local_map_max_pt_num // 5)
                  & jnp.asarray(removal_enabled))
    # (callers pass an already speed-scaled gate; the floor lives HERE only)
    dist_max = jnp.maximum(dynamic_dist_max, map_cfg.dynamic_dist_thre_min + 0.1)

    append_ok = jnp.asarray(append_enabled)
    # Stage 1 — per-class elementwise prep (transform, crops, dynamic
    # removal); the per-class parts are cheap masked vector math
    merged_by_name = {}
    fresh_by_name = {}
    for name in FEATURE_NAMES:
        old = local_map.clouds[name].transform(T_inv)  # into new frame coords
        add = frame.down[name]
        # append-radius crop: only points near the scanner join the map
        # (`--append_frame_radius`, `mulls_slam.cpp:143,259,438`)
        add = add.replace(mask=add.mask & append_ok & (
            jnp.linalg.norm(add.xyz, axis=-1) < map_cfg.append_frame_radius))
        if name in _DYNAMIC_CLASSES:
            keep = _dynamic_removal_mask(
                add, old, map_cfg.dynamic_removal_radius,
                map_cfg.dynamic_dist_thre_min, dist_max,
                map_cfg.near_dist_thre, removal_on)
            add = add.replace(mask=keep)
        merged = old.concat(add)
        # sphere crop (`map_manager.cpp:62-67`)
        rng = jnp.linalg.norm(merged.xyz, axis=-1)
        merged_by_name[name] = merged.replace(
            mask=merged.mask & (rng < map_cfg.local_map_radius))
        fresh_by_name[name] = jnp.concatenate([
            jnp.zeros((old.capacity,), jnp.float32),
            jnp.full((add.capacity,), 0.5, jnp.float32)])

    # Stage 2 — ONE class-keyed sort re-budgets every class at once
    # (round 5; previously six per-class `top_k` compactions at ~1.1-1.3 ms
    # each dominated the map stage, docs/PERF.md).  Each class keeps a SOFT
    # preference for the new frame's points (+0.5 on a uniform[0,1) score:
    # an old point still outranks a fresh one 12.5% of the time —
    # deliberate deviation from the reference's uniform re-budget,
    # `map_manager.cpp:73-86`, so fresh coverage is rarely evicted
    # wholesale).  Sort key = class_id*4 + (1.5 - score) for valid rows,
    # class_id*4 + 3 for invalid: ascending sort groups rows by class
    # (segment starts are STATIC — every class's merged capacity is
    # fixed), ranks valid rows by descending score within the class, and
    # parks invalid rows at the segment tail; each class's winners are
    # then a static slice of the sorted order.
    lengths = [merged_by_name[n].capacity for n in FEATURE_NAMES]
    starts = np.concatenate([[0], np.cumsum(lengths)]).astype(int)
    all_mask = jnp.concatenate([merged_by_name[n].mask
                                for n in FEATURE_NAMES])
    score = jax.random.uniform(key, all_mask.shape) + jnp.concatenate(
        [fresh_by_name[n] for n in FEATURE_NAMES])
    class_id = jnp.concatenate([
        jnp.full((lengths[i],), 4.0 * i, jnp.float32)
        for i in range(len(FEATURE_NAMES))])
    sort_key = class_id + jnp.where(all_mask, 1.5 - score,
                                    jnp.float32(3.0))
    perm = jnp.argsort(sort_key)

    def _cat(field):
        return jnp.concatenate([getattr(merged_by_name[n], field)
                                for n in FEATURE_NAMES])[perm]

    sorted_cloud = FeatureCloud(xyz=_cat("xyz"), normal=_cat("normal"),
                                intensity=_cat("intensity"),
                                strength=_cat("strength"),
                                height=_cat("height"),
                                ts_ratio=_cat("ts_ratio"),
                                mask=_cat("mask"))
    new_clouds = {}
    for i, name in enumerate(FEATURE_NAMES):
        cap = caps.capacity(name)
        sl = slice(int(starts[i]), int(starts[i]) + cap)
        new_clouds[name] = jax.tree.map(lambda a: a[sl], sorted_cloud)

    # vertex descriptors ride the same permutation (vertex segment only)
    i_v = FEATURE_NAMES.index("vertex")
    cap_v = caps.capacity("vertex")
    vert_perm = perm[int(starts[i_v]):int(starts[i_v]) + cap_v] \
        - jnp.int32(starts[i_v])
    desc_vec = jnp.concatenate([local_map.vertex_desc.vec,
                                frame.descriptors.vec], axis=0)
    desc_mask = jnp.concatenate([local_map.vertex_desc.mask,
                                 frame.descriptors.mask], axis=0)
    new_desc = VertexDescriptors(
        vec=desc_vec[vert_perm],
        mask=new_clouds["vertex"].mask & desc_mask[vert_perm])

    return LocalMap(clouds=new_clouds, vertex_desc=new_desc)


# `MapManager::update_cloud_vectors` hardcoded operating point
# (`src/map_manager.cpp:100-106`)
_REFRESH_RADIUS = 1.8
_REFRESH_MIN_K = 6
_REFRESH_MIN_LINEARITY = 0.65
_REFRESH_PILLAR_SIN = 0.80  # keep pillar if |dir_z| > sin(55 deg)
_REFRESH_BEAM_SIN = 0.25    # keep beam  if |dir_z| < sin(15 deg)


def refresh_linear_map_vectors(local_map: LocalMap) -> LocalMap:
    """Re-estimate the map's linear-feature direction vectors
    (`MapManager::update_cloud_vectors`, `src/map_manager.cpp:95-292`).

    Every `local_map_recalculation_frequency` frames
    (`mulls_slam.cpp:148,431-435`) the reference re-runs neighborhood PCA
    on the MERGED map pillar/beam clouds — directions estimated from one
    scan's sparse neighborhood are replaced by the denser multi-scan
    estimate — and simultaneously CULLS points whose merged neighborhood
    is no longer strongly linear (linearity <= 0.65) or correctly oriented
    (pillar needs |dir_z| > 0.80, beam |dir_z| < 0.25): re-PCA doubles as
    a map consistency filter.  Here both become one radius-moments pass
    per class + masked selects (culled rows are compacted away by the
    next update's re-budget gather).
    """
    from mulls_tpu.ops.pca import pca_features

    new_clouds = dict(local_map.clouds)
    for name, keep_gate in (("pillar",
                             lambda dz: dz > _REFRESH_PILLAR_SIN),
                            ("beam",
                             lambda dz: dz < _REFRESH_BEAM_SIN)):
        c = local_map.clouds[name]
        f = pca_features(c.xyz, c.mask, c.xyz, c.mask,
                         _REFRESH_RADIUS, _REFRESH_MIN_K)
        keep = (f.valid & (f.linearity > _REFRESH_MIN_LINEARITY)
                & keep_gate(jnp.abs(f.principal[:, 2])))
        new_clouds[name] = c.replace(
            normal=jnp.where(keep[:, None], f.principal, c.normal),
            strength=jnp.where(keep, f.linearity, c.strength),
            mask=c.mask & keep)
    return LocalMap(clouds=new_clouds, vertex_desc=local_map.vertex_desc)
