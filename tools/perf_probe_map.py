"""Map-stage probe: ms/frame of update_local_map at the KITTI-urban
operating shapes, scan-looped to data-on-host (the round-5 fused
class-keyed-sort re-budget vs the round-4 six-top_k layout)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from mulls_tpu.config import load_flagfile
from mulls_tpu.mapping.local_map import init_local_map, update_local_map
from mulls_tpu.core.cloud import FEATURE_NAMES, FeatureCloud, FeatureFrame, VertexDescriptors

REPS = int(os.environ.get("PROBE_REPS", "32"))
cfg = load_flagfile("/root/reference/script/config/lo_gflag_list_kitti_urban.txt")
mc = cfg.map
rng = np.random.default_rng(0)

def mk_cloud(n):
    return FeatureCloud(
        xyz=jnp.asarray(rng.uniform(-40, 40, (n, 3)), jnp.float32),
        normal=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        intensity=jnp.zeros((n,), jnp.float32),
        strength=jnp.zeros((n,), jnp.float32),
        height=jnp.zeros((n,), jnp.float32),
        ts_ratio=jnp.zeros((n,), jnp.float32),
        mask=jnp.asarray(rng.uniform(size=n) < 0.9))

down = {n: mk_cloud(getattr(cfg.feature, {"ground": "ground_down_fixed_num",
        "pillar": "pillar_down_fixed_num", "facade": "facade_down_fixed_num",
        "beam": "beam_down_fixed_num", "roof": "roof_down_fixed_num"}.get(n, "ground_down_fixed_num"))
        if n != "vertex" else cfg.feature.vertex_keep_num) for n in FEATURE_NAMES}
nv = down["vertex"].capacity
frame = FeatureFrame(down=down, full=None, bbx_min=jnp.zeros(3), bbx_max=jnp.ones(3),
                     descriptors=VertexDescriptors(
                         vec=jnp.zeros((nv, 11), jnp.float32),
                         mask=jnp.ones((nv,), bool)))
lm = init_local_map(mc)
T = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.7)

@jax.jit
def loop(lm, key):
    def body(carry, k):
        m = update_local_map(carry, frame, T, jnp.float32(1.0), mc, k)
        return m, m.clouds["ground"].xyz[0, 0]
    keys = jax.random.split(key, REPS)
    m, outs = jax.lax.scan(body, lm, keys)
    return m, outs

m, outs = loop(lm, jax.random.PRNGKey(0)); np.asarray(outs)  # warm
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    m, outs = loop(m, jax.random.PRNGKey(1))
    np.asarray(outs)
    best = min(best, (time.perf_counter() - t0) / REPS)
print(f"update_local_map: {best*1e3:.2f} ms/frame (best of 5x{REPS})")
