import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np, jax, jax.numpy as jnp
from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.core.cloud import pack_raw_host
from mulls_tpu.pipeline.odometry import init_state, slam_step
cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
frames = [ds[i] for i in range(len(ds))]
state = init_state(cfg)
state, out = slam_step(state, jax.device_put(pack_raw_host(frames[0])), cfg)
jax.block_until_ready(out.pose)
def chain(tag):
    global state
    t0 = time.perf_counter()
    for f in frames:
        state, out = slam_step(state, jax.device_put(pack_raw_host(f)), cfg)
    jax.block_until_ready(out.pose)
    print(f"{tag}: {(time.perf_counter()-t0)/16*1e3:.1f} ms/frame")
chain("pre-D2H")
t0=time.perf_counter(); _ = np.asarray(out.vec)
print(f"D2H: {(time.perf_counter()-t0)*1e3:.0f} ms")
chain("post-D2H #1")
chain("post-D2H #2")
time.sleep(10)
chain("after 10s idle")
time.sleep(30)
chain("after 30s idle")
