import os, time, dataclasses
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.ops import ground as ground_ops, voxel as voxel_ops

cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
f = ds[0]
xyz = jnp.asarray(f["xyz"]); inten = jnp.asarray(f["intensity"])
mask0 = jnp.asarray(f["mask"]); key = jax.random.key(0)
mask = voxel_ops.dist_filter_mask(xyz, mask0, cfg.preprocess.min_dist_used, cfg.preprocess.max_dist_used)

def timeit(name, fn, n=6):
    r = fn(0); np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for i in range(n): r = fn(i)
    np.asarray(jax.tree.leaves(r)[0])
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:9.1f} ms", flush=True)

for m in (3, 0):
    g2 = dataclasses.replace(cfg.ground, ground_normal_method=m)
    fn = jax.jit(lambda i, g2=g2: ground_ops.fast_ground_filter(
        xyz, inten, mask, g2, cfg.shapes, jax.random.fold_in(key, i)))
    timeit(f"ground_filter method={m}", fn)
