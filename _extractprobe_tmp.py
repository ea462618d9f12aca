import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.core.cloud import RawCloud
from mulls_tpu.ops import ground as ground_ops, voxel as voxel_ops
from mulls_tpu.ops import pca as pca_ops, neighbors as nbr

cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
f = ds[0]
xyz = jnp.asarray(f["xyz"]); inten = jnp.asarray(f["intensity"])
mask = jnp.asarray(f["mask"]); key = jax.random.key(0)
fcfg, shapes, gcfg, pre = cfg.feature, cfg.shapes, cfg.ground, cfg.preprocess

def timeit(name, fn, n=6):
    r = fn(0); np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for i in range(n): r = fn(i)
    np.asarray(jax.tree.leaves(r)[0])
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1e3:9.1f} ms", flush=True)
    return r

m0 = timeit("dist_filter", jax.jit(lambda i: voxel_ops.dist_filter_mask(xyz, mask, pre.min_dist_used, pre.max_dist_used)))
g = timeit("fast_ground_filter", jax.jit(lambda i: ground_ops.fast_ground_filter(
    xyz, inten, m0, gcfg, shapes, jax.random.fold_in(key, i),
    fixed_num_downsampling=fcfg.fixed_num_downsampling_on), static_argnums=()))
from mulls_tpu.frontend.features import compact_topk_random
ug_idx, ug_valid = jax.jit(lambda: compact_topk_random(g.is_unground, shapes.n_unground, key))()
ug_xyz = xyz[ug_idx]
pf = jax.jit(partial(pca_ops.pca_features, radius=fcfg.cloud_pca_neigh_r,
                     min_k=fcfg.cloud_pca_neigh_k_min,
                     distance_adaptive=fcfg.use_distance_adaptive_pca,
                     unit_dist=fcfg.unit_dist, chunk=1024))
feats = timeit("pca_features (20480q x 20480s)", lambda i: pf(ug_xyz, ug_valid, ug_xyz, ug_valid))
onehot = jnp.ones((shapes.n_unground, 4), jnp.float32)
rd = jnp.full((shapes.n_vertex_full,), fcfg.cloud_pca_neigh_r, jnp.float32)
kc = jax.jit(partial(nbr.knn_class_counts, k=fcfg.cloud_pca_neigh_k,
                     close_r2=0.64 * fcfg.cloud_pca_neigh_r ** 2, chunk=256))
timeit("knn_class_counts (vertex)", lambda i: kc(ug_xyz[:shapes.n_vertex_full], ug_valid[:shapes.n_vertex_full], ug_xyz, ug_valid, rd, class_onehot=onehot, p_intensity=inten[ug_idx]))
print("n_vertex_full:", shapes.n_vertex_full, "n_unground:", shapes.n_unground)
