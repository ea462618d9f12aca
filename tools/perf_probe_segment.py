import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
from mulls_tpu.config import load_flagfile
from mulls_tpu.io.dataset import FolderDataset
from mulls_tpu.pipeline.odometry import OdometryPipeline
cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
ds = FolderDataset("/root/reference/demo_data/pcd", cfg.shapes.n_raw)
frames = [ds[i] for i in range(len(ds))]
order = list(range(16)) + list(range(14, 0, -1))
playlist = [frames[i] for i in (order * 6)[:128]]
for seg in (16, 32, 64):
    pipe = OdometryPipeline(cfg, segment=seg)
    pipe.run(frames[:3])
    t0 = time.perf_counter()
    res = pipe.run(playlist)
    dt = time.perf_counter() - t0
    print(f"segment={seg}: {len(playlist)/dt:.1f} fps  ok={all(c==1 for c in res.codes)}")
