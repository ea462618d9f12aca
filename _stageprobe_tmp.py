import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.core.cloud import RawCloud
from mulls_tpu.frontend.features import extract_features
from mulls_tpu.frontend.icp import mm_lls_icp
from mulls_tpu.mapping.local_map import init_local_map, update_local_map

cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
f = ds[0]
raw = RawCloud(xyz=jnp.asarray(f["xyz"]), intensity=jnp.asarray(f["intensity"]),
               ts_ratio=jnp.asarray(f["ts_ratio"]), mask=jnp.asarray(f["mask"]))
key = jax.random.key(0)

def timeit(name, fn, n=8, fetch=lambda r: r):
    r = fn(0)
    np.asarray(jax.tree.leaves(fetch(r))[0])  # compile + sync
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(i)
    np.asarray(jax.tree.leaves(fetch(r))[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:30s} {dt:9.1f} ms")
    return r

ex = jax.jit(extract_features, static_argnames=("cfg",))
frame = timeit("extract_features", lambda i: ex(raw, cfg, jax.random.fold_in(key, i)))

lm = init_local_map(cfg.map)
ulm = jax.jit(update_local_map, static_argnames=("map_cfg",))
lm2 = timeit("update_local_map", lambda i: ulm(lm, frame, jnp.eye(4), jnp.float32(1.2), cfg.map, jax.random.fold_in(key, i)))
# fill the map somewhat: do 8 updates
for i in range(8):
    lm = ulm(lm, frame, jnp.eye(4), jnp.float32(1.2), cfg.map, jax.random.fold_in(key, 100+i))

icp = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))
timeit("mm_lls_icp s2m (20 it)", lambda i: icp(frame.down, lm.clouds, cfg.reg, jnp.eye(4), max_iter=cfg.reg.reg_max_iter_num_s2m), fetch=lambda r: r.transform)
timeit("mm_lls_icp s2m (1 it)", lambda i: icp(frame.down, lm.clouds, cfg.reg, jnp.eye(4), max_iter=1), fetch=lambda r: r.transform)
