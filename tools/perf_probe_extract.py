"""Per-stage chip-time probe for extract_features (the round-2 perf target).

Times each extraction sub-stage as a scan-repeated jitted loop (amortizing
the tunnel's ~5 ms dispatch floor) ending in a real host fetch.  Inputs are
the real demo scan so segment-op cell distributions are realistic.
"""
import os
import sys
import time

# NOTE: do NOT launch with PYTHONPATH=/root/repo — having the repo root on
# sys.path at interpreter startup shadows a module the axon PJRT plugin
# needs and the TPU backend silently fails to register.  Inserting the
# path here (after sitecustomize ran) is safe.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.core.cloud import RawCloud, compact_topk_random, compact_topk_score
from mulls_tpu.frontend.features import extract_features
from mulls_tpu.ops import ground as ground_ops
from mulls_tpu.ops import pca as pca_ops
from mulls_tpu.ops import nms as nms_ops
from mulls_tpu.ops import neighbors as nbr

REPS = int(os.environ.get("PROBE_REPS", "24"))

cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
shapes = cfg.shapes
fcfg = cfg.feature
ds = FolderDataset("/root/reference/demo_data/pcd", shapes.n_raw)
d = ds[0]
raw = RawCloud(xyz=jnp.asarray(d["xyz"]), intensity=jnp.asarray(d["intensity"]),
               ts_ratio=jnp.asarray(d["ts_ratio"]), mask=jnp.asarray(d["mask"]))

# build a realistic unground set once
g0 = jax.jit(lambda: ground_ops.fast_ground_filter(
    raw.xyz, raw.intensity, raw.mask, cfg.ground, shapes,
    jax.random.PRNGKey(0)))()
ug_idx, ug_valid = jax.jit(lambda m, k: compact_topk_random(m, shapes.n_unground, k)
                           )(g0.is_unground, jax.random.PRNGKey(1))
ug_xyz = raw.xyz[ug_idx]
ug_int = raw.intensity[ug_idx]
onehot = jax.nn.one_hot(
    jax.random.randint(jax.random.PRNGKey(2), (shapes.n_unground,), 0, 4), 4,
    dtype=jnp.float32) * ug_valid[:, None]


def timeit(name, fn, reps=REPS, passes=3):
    @jax.jit
    def loop():
        def body(c, i):
            return c + fn(c, jax.random.PRNGKey(7).astype(jnp.uint32) + i.astype(jnp.uint32)) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return c
    np.asarray(loop())  # compile + warm
    best = 1e9
    for _ in range(passes):
        t0 = time.perf_counter()
        np.asarray(loop())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best / reps * 1000.0:8.2f} ms", flush=True)
    return best / reps


def st_full(c, k):
    f = extract_features(raw.replace(xyz=raw.xyz + c * 1e-6), cfg, k)
    return (jnp.sum(f.down["ground"].xyz) + jnp.sum(f.down["pillar"].mask)
            + jnp.sum(f.descriptors.vec))


def st_ground(c, k):
    g = ground_ops.fast_ground_filter(raw.xyz + c * 1e-6, raw.intensity,
                                      raw.mask, cfg.ground, shapes, k)
    return jnp.sum(g.height) + jnp.sum(g.is_ground) + jnp.sum(g.normal)


def st_ground0(c, k):
    import dataclasses
    g = ground_ops.fast_ground_filter(
        raw.xyz + c * 1e-6, raw.intensity, raw.mask,
        dataclasses.replace(cfg.ground, ground_normal_method=0), shapes, k)
    return jnp.sum(g.height) + jnp.sum(g.is_ground)


def st_pca(c, k):
    f = pca_ops.pca_features(ug_xyz + c * 1e-6, ug_valid, ug_xyz + c * 1e-6,
                             ug_valid, radius=fcfg.cloud_pca_neigh_r,
                             min_k=fcfg.cloud_pca_neigh_k_min,
                             distance_adaptive=fcfg.use_distance_adaptive_pca,
                             unit_dist=fcfg.unit_dist, chunk=1024)
    return jnp.sum(f.curvature) + jnp.sum(f.principal)


def st_vertex(c, k):
    q = ug_xyz[:shapes.n_vertex_full] + c * 1e-6
    r = jnp.full((shapes.n_vertex_full,), fcfg.cloud_pca_neigh_r, jnp.float32)
    m2 = nbr.knn_class_counts(q, ug_valid[:shapes.n_vertex_full], ug_xyz,
                              ug_valid, r, k=fcfg.cloud_pca_neigh_k,
                              class_onehot=onehot, p_intensity=ug_int,
                              close_r2=0.64 * fcfg.cloud_pca_neigh_r ** 2,
                              chunk=256)
    return jnp.sum(m2["count"]) + jnp.sum(m2["close_counts"])


def st_compact_131k(c, k):
    key = jax.random.PRNGKey(0)
    m = raw.mask & (raw.xyz[:, 2] + c * 1e-6 > -1.0)
    idx, valid = compact_topk_random(m, shapes.n_unground, key)
    return jnp.sum(idx) * 1.0 + jnp.sum(valid)


def st_compact_131k_8k(c, k):
    key = jax.random.PRNGKey(0)
    m = raw.mask & (raw.xyz[:, 2] + c * 1e-6 > -1.0)
    idx, valid = compact_topk_random(m, shapes.n_ground_full, key)
    return jnp.sum(idx) * 1.0 + jnp.sum(valid)


def st_compact_20k_4k(c, k):
    key = jax.random.PRNGKey(0)
    m = ug_valid & (ug_xyz[:, 2] + c * 1e-6 > -1.0)
    idx, valid = compact_topk_random(m, 4096, key)
    return jnp.sum(idx) * 1.0 + jnp.sum(valid)


def st_topk_score(c, k):
    s = ug_xyz[:, 2] + c * 1e-6
    idx, valid = compact_topk_score(ug_valid, s, shapes.n_vertex_full)
    return jnp.sum(idx) * 1.0


def st_nms(c, k):
    keep = nms_ops.non_max_suppress(ug_xyz[:4096] + c * 1e-6,
                                    ug_int[:4096], ug_valid[:4096],
                                    0.25 * fcfg.cloud_pca_neigh_r,
                                    iterations=fcfg.nms_iterations)
    return jnp.sum(keep)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} reps={REPS}")
    timeit("extract_features (full)", st_full)
    timeit("ground filter (method cfg)", st_ground)
    timeit("ground filter (method 0)", st_ground0)
    timeit("pca moments 20k x 20k", st_pca)
    timeit("vertex knn_class_counts", st_vertex)
    timeit("compact 131k -> 20480", st_compact_131k)
    timeit("compact 131k -> 8192", st_compact_131k_8k)
    timeit("compact 20k -> 4096", st_compact_20k_4k)
    timeit("topk_score 20k -> 4096", st_topk_score)
    timeit("nms 4096 (x1)", st_nms)


# --- ground-filter sub-stage op-class probes (round-3 redesign) ----------
_n = shapes.n_raw
_g = shapes.grid_dim
_cells = _g * _g
_cell = jnp.asarray(
    np.random.default_rng(0).integers(0, _cells, _n), jnp.int32)
_below = jnp.asarray(np.random.default_rng(1).random(_n) < 0.7)
_cs = jnp.where(_below, _cell, _cells)


def st_seg_max26(c, k):
    v = (raw.xyz[:, 0:1] * 100 + c).astype(jnp.int32) + jnp.arange(
        26, dtype=jnp.int32)[None, :]
    m = jax.ops.segment_max(jnp.where(_below[:, None], v, -1), _cs,
                            num_segments=_cells + 1)
    return jnp.sum(m[:_cells, 0].astype(jnp.float32))


def st_raster_count(c, k):
    row = _cell // _g
    col = _cell % _g
    iota = jnp.arange(_g, dtype=jnp.int32)
    row_oh = ((row[:, None] == iota[None]) & _below[:, None]
              ).astype(jnp.bfloat16)
    col_oh = (col[:, None] == iota[None]).astype(jnp.bfloat16)
    cnt = jax.lax.dot_general(row_oh, col_oh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return jnp.sum(cnt) + c * 0


def st_seg_sum90(c, k):
    blocks = (raw.xyz[:, 0:1] + c) * jnp.ones((1, 90), jnp.float32)
    s = jax.ops.segment_sum(blocks, _cs, num_segments=_cells + 1)
    return jnp.sum(s[:_cells, 0])


def st_hash_picks(c, k):
    salt = jnp.arange(24, dtype=jnp.uint32)[None, :] + c.astype(jnp.uint32)
    h = (jnp.arange(_n, dtype=jnp.uint32)[:, None]
         * jnp.uint32(2654435761) + salt)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    u01 = (h >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    pick_v = jnp.clip((0.4 * u01 + raw.xyz[:, 2:3]) * 1000.0,
                      0.0, 16383.0).astype(jnp.int32)
    key2 = (pick_v << 17) | jnp.arange(_n, dtype=jnp.int32)[:, None]
    return jnp.sum(key2.astype(jnp.float32) * 1e-12)


def st_gather32(c, k):
    tab = jnp.ones((_cells, 32), jnp.float32) * c
    out = tab[jnp.clip(_cell, 0, _cells - 1)]
    return jnp.sum(out[:, 0])


if __name__ == "__main__":
    timeit("seg_max int32 w26", st_seg_max26)
    timeit("raster count (bf16 mxu)", st_raster_count)
    timeit("seg_sum f32 w90", st_seg_sum90)
    timeit("hash picks [n,24]", st_hash_picks)
    timeit("gather [n,32] from cells", st_gather32)
