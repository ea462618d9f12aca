import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax
from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.pipeline.odometry import init_state, prefetch_segments, slam_scan

cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
frames = [ds[i] for i in range(16)]
batch = next(b for _, b in prefetch_segments(frames, 16))
state = init_state(cfg)
state, vecs = slam_scan(state, batch, cfg)
jax.block_until_ready(vecs)  # compile only, NO data fetch

N = 8
state = init_state(cfg)
t0 = time.perf_counter()
for _ in range(N):
    state, vecs = slam_scan(state, batch, cfg)
v = np.asarray(vecs)          # fetch INSIDE the timer: forces true completion
t1 = time.perf_counter()
print(f"{N} segments to data-on-host: {(t1-t0):.2f} s -> "
      f"{(t1-t0)/N*1e3:.0f} ms/segment, {N*16/(t1-t0):.1f} fps")
