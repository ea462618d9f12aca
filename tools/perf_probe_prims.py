"""Micro-bench of the primitive op classes behind the extraction hot path:
segment reductions (width x n scaling), sort/argsort, top_k, nonzero-style
cumsum compaction.  Informs the round-2 kernel redesign."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

REPS = 24
C = 25601


def timeit(name, fn, reps=REPS, passes=3):
    @jax.jit
    def loop():
        def body(c, i):
            return c + fn(c) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return c
    np.asarray(loop())
    best = 1e9
    for _ in range(passes):
        t0 = time.perf_counter()
        np.asarray(loop())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best / reps * 1000.0:8.3f} ms", flush=True)


key = jax.random.PRNGKey(0)
n = 131072
cell = jax.random.randint(key, (n,), 0, C - 1)
vals = jax.random.normal(key, (n,))
v8 = jax.random.normal(key, (n, 8))
v24 = jax.random.normal(key, (n, 24))
v73 = jax.random.normal(key, (n, 73))
n2 = 32768
cell2 = cell[:n2]

if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    timeit("segment_sum 131k w1", lambda c: jnp.sum(jax.ops.segment_sum(vals + c, cell, num_segments=C)))
    timeit("segment_sum 131k w8", lambda c: jnp.sum(jax.ops.segment_sum(v8 + c, cell, num_segments=C)))
    timeit("segment_sum 131k w24", lambda c: jnp.sum(jax.ops.segment_sum(v24 + c, cell, num_segments=C)))
    timeit("segment_sum 131k w73", lambda c: jnp.sum(jax.ops.segment_sum(v73 + c, cell, num_segments=C)))
    timeit("segment_min 131k w1", lambda c: jnp.sum(jax.ops.segment_min(vals + c, cell, num_segments=C)))
    timeit("segment_max 131k w24", lambda c: jnp.sum(jax.ops.segment_max(v24 + c, cell, num_segments=C)))
    timeit("segment_sum 32k w24", lambda c: jnp.sum(jax.ops.segment_sum(v24[:n2] + c, cell2, num_segments=C)))
    timeit("segment_sum 131k w8 sorted-flag", lambda c: jnp.sum(
        jax.ops.segment_sum(v8 + c, jnp.sort(cell), num_segments=C, indices_are_sorted=True)))
    timeit("argsort 131k i32", lambda c: jnp.sum(jnp.argsort(cell + (c > 1e30).astype(jnp.int32))))
    timeit("sort 131k f32", lambda c: jnp.sum(jnp.sort(vals + c)))
    timeit("top_k 131k k=20480", lambda c: jnp.sum(jax.lax.top_k(vals + c, 20480)[1]))
    timeit("top_k 20k k=25 (x80 rows 256)", lambda c: jnp.sum(
        jax.lax.top_k(jax.random.normal(key, (256, 20480)) + c, 25)[0]))
    timeit("cumsum 131k", lambda c: jnp.sum(jnp.cumsum((vals + c > 0).astype(jnp.int32))))
    timeit("scatter-sorted 131k->20480", lambda c: jnp.sum(
        jnp.zeros((20480,), jnp.float32).at[jnp.minimum(jnp.cumsum((vals + c > 0).astype(jnp.int32)) - 1, 20479)].add(vals, indices_are_sorted=True)))
