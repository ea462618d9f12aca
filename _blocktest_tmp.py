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
jax.block_until_ready(batch.xyz_q)
state = init_state(cfg)
state, vecs = slam_scan(state, batch, cfg)
np.asarray(vecs)  # full sync incl. compute

N = 8
state = init_state(cfg)
t0 = time.perf_counter()
for _ in range(N):
    state, vecs = slam_scan(state, batch, cfg)
t1 = time.perf_counter()
jax.block_until_ready(vecs)
t2 = time.perf_counter()
v = np.asarray(vecs)
t3 = time.perf_counter()
print(f"enqueue {N} segs: {(t1-t0)*1e3:.1f} ms | block_until_ready: "
      f"{(t2-t1)*1e3:.1f} ms | np.asarray fetch: {(t3-t2)*1e3:.1f} ms")
print(f"=> true per-segment: {(t3-t0)/N*1e3:.1f} ms, per-frame "
      f"{(t3-t0)/N/16*1e3:.2f} ms, fps {N*16/(t3-t0):.1f}")
