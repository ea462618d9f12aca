"""MFU / roofline probe for the hot kernels (VERDICT r4 Next #4).

Measures achieved FLOPs of `nn_pallas`, `moments_pallas` and
`pca_moments_pallas` at the KITTI operating shapes against the chip's
measured matmul peak (a pure bf16/f32 matmul of comparable shape serves
as the in-situ "speed of light" — tunnel-independent because everything
here times a scan-looped kernel to data-on-host).

Also times diagnostic VARIANTS of the pca-moments kernel to attribute
its gap (distance+adjacency only / static feature stack, no per-tile
build) so PERF.md can state per stage whether it is MXU-, VPU- or
layout-bound.

Writes docs/MFU.json and prints the PERF.md table.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from mulls_tpu.ops.kernels import (TQ, TP, nn_pallas, moments_pallas,
                                   pca_moments_pallas)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(os.environ.get("PROBE_REPS", "16"))


def timed(fn, *args):
    """Scan-looped kernel timing to data-on-host: seconds per call.
    The first (float) argument is perturbed by the carry so XLA cannot
    hoist the loop-invariant body out of the scan."""

    @jax.jit
    def loop(*a):
        def body(c, _):
            a0 = a[0] + c.astype(a[0].dtype) * 0
            r = fn(a0, *a[1:])
            r = r[0] if isinstance(r, tuple) else r
            s = jnp.sum(r.astype(jnp.float32))
            return c + s * 0.0 + 1.0, s

        return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[1]

    np.asarray(loop(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


# --- diagnostic pca-moments variants --------------------------------------

def _kernel_dist_only(q_ref, pt_ref, p2_ref, r2_ref, s_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)
    i = pl.program_id(0)
    q = q_ref[:]
    q2 = jnp.sum(q * q, axis=1)
    cross = jnp.dot(q, pt_ref[:], preferred_element_type=jnp.float32)
    d2 = q2[:, None] + p2_ref[:] - 2.0 * cross
    adj = (d2 <= r2_ref[i, :][:, None]).astype(jnp.float32)
    s_ref[:, 0:1] += jnp.sum(adj, axis=1, keepdims=True)


def _kernel_static_f(q_ref, pt_ref, p2_ref, r2_ref, f_ref, s_ref):
    """Full matmul against a PRE-BUILT [TP,128] bf16 stack (no per-tile
    f10 construction): isolates the in-kernel build+transpose cost."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)
    q = q_ref[:]
    q2 = jnp.sum(q * q, axis=1)
    cross = jnp.dot(q, pt_ref[:], preferred_element_type=jnp.float32)
    d2 = q2[:, None] + p2_ref[:] - 2.0 * cross
    adj = (d2 <= r2_ref[i, :][:, None]).astype(jnp.bfloat16)
    s_ref[:] += jnp.dot(adj, f_ref[:], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)


def _variant(kernel, with_f, q, p, p_mask, r2):
    qn, pn = q.shape[0], p.shape[0]
    qp = -(-qn // TQ) * TQ
    pp = -(-pn // TP) * TP
    qq = jnp.pad(q, ((0, qp - qn), (0, 0)))
    ppad = jnp.pad(p, ((0, pp - pn), (0, 0)))
    p2 = jnp.sum(ppad * ppad, axis=1) + jnp.where(
        jnp.pad(p_mask, (0, pp - pn)), 0.0, 3e38)
    r2p = jnp.pad(r2, (0, qp - qn))
    in_specs = [
        pl.BlockSpec((TQ, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((qp // TQ, TQ), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qq, ppad.T, p2[None, :], r2p.reshape(qp // TQ, TQ)]
    if with_f:
        in_specs.append(pl.BlockSpec((TP, 128), lambda i, j: (j, 0),
                                     memory_space=pltpu.VMEM))
        f = jnp.ones((pp, 128), jnp.bfloat16)
        args.append(f)
    return pl.pallas_call(
        kernel, grid=(qp // TQ, pp // TP), in_specs=in_specs,
        out_specs=pl.BlockSpec((TQ, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), jnp.float32),
    )(*args)


def main():
    rng = np.random.default_rng(0)
    out = {"reps": REPS, "rows": []}

    # measured chip peaks at kernel-comparable shapes
    a = jnp.asarray(rng.normal(size=(8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(8192, 8192)), jnp.bfloat16)
    t = timed(lambda a_, b_: jnp.dot(a_, b_,
                                     preferred_element_type=jnp.float32),
              a, b)
    peak_bf16 = 2 * 8192**3 / t / 1e12
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    t = timed(lambda a_, b_: jnp.dot(a_, b_), af, bf)
    peak_f32 = 2 * 8192**3 / t / 1e12
    out["measured_peak_bf16_tflops"] = round(peak_bf16, 1)
    out["measured_peak_f32_tflops"] = round(peak_f32, 1)
    print(f"measured matmul peak: bf16 {peak_bf16:.1f} TF, "
          f"f32 {peak_f32:.1f} TF", flush=True)

    def report(name, seconds, flops, peak_tf, note=""):
        ach = flops / seconds / 1e12
        row = {"kernel": name, "ms": round(seconds * 1e3, 3),
               "gflops": round(flops / 1e9, 1),
               "achieved_tflops": round(ach, 2),
               "mfu_pct": round(100 * ach / peak_tf, 1), "note": note}
        out["rows"].append(row)
        print(f"{name:34s} {row['ms']:7.2f} ms  {row['achieved_tflops']:6.2f} TF "
              f"({row['mfu_pct']:4.1f}% of {peak_tf:.0f} TF)  {note}",
              flush=True)

    # --- 1-NN at ICP shapes: 2560 source vs 20480 map pts (one class
    # sweep of the s2m correspondence, `frontend/icp.py`)
    q = jnp.asarray(rng.uniform(-40, 40, (2560, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(-40, 40, (20480, 3)), jnp.float32)
    pm = jnp.ones(20480, bool)
    qm = jnp.ones(2560, bool)
    s = timed(lambda *a: nn_pallas(*a)[1], q, qm, p, pm)
    # FLOPs: cross matmul [Q,3]@[3,P] + 4 VPU ops per cell
    fl = 2 * 2560 * 3 * 20480 + 6 * 2560 * 20480
    report("nn_pallas 2.5k x 20k", s, fl, peak_f32, "latency-floor bound")

    # 1-NN at map-side dynamic-removal shape: 20k x 20k
    q2_ = jnp.asarray(rng.uniform(-40, 40, (20480, 3)), jnp.float32)
    s = timed(lambda *a: nn_pallas(*a)[1], q2_, jnp.ones(20480, bool), p, pm)
    fl = 2 * 20480 * 3 * 20480 + 6 * 20480 * 20480
    report("nn_pallas 20k x 20k", s, fl, peak_f32)

    # --- PCA moments at extraction shape: 20k queries x 20k support
    r2 = jnp.full((20480,), 1.0, jnp.float32)
    s = timed(lambda *a: pca_moments_pallas(*a)[0], q2_, p, pm, r2)
    # hardware FLOPs: [TQ,TP]@[TP,128] per tile pair
    n_t = (20480 // TQ) * (20480 // TP)
    fl = n_t * 2 * TQ * TP * 128
    report("pca_moments_pallas 20k x 20k", s, fl, peak_bf16,
           "hi/lo bf16 moments")

    # diagnostic variants
    s = timed(lambda *a: _variant(_kernel_dist_only, False, *a),
              q2_, p, pm, r2)
    report("  variant: d2+adjacency only", s,
           n_t * (2 * TQ * 3 * TP + 6 * TQ * TP), peak_f32,
           "distance floor")
    s = timed(lambda *a: _variant(_kernel_static_f, True, *a),
              q2_, p, pm, r2)
    report("  variant: static [TP,128] stack", s, fl, peak_bf16,
           "no per-tile f10 build")

    # --- moments_pallas (NCC descriptor counts): 4096 vertices x 8192
    qv = jnp.asarray(rng.uniform(-40, 40, (4096, 3)), jnp.float32)
    pv = jnp.asarray(rng.uniform(-40, 40, (8192, 3)), jnp.float32)
    fs = jnp.asarray(rng.uniform(0, 1, (8192, 8)), jnp.float32)
    r2v = jnp.full((4096,), 1.0, jnp.float32)
    s = timed(lambda *a: moments_pallas(*a)[0], qv, pv,
              jnp.ones(8192, bool), r2v, fs)
    n_t = (4096 // TQ) * (8192 // TP)
    fl = n_t * 2 * TQ * TP * 128 * 2  # two matmuls (far + close)
    report("moments_pallas 4k x 8k (w/close)", s, fl, peak_f32)

    with open(os.path.join(_REPO, "docs", "MFU.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("written docs/MFU.json", flush=True)


if __name__ == "__main__":
    main()
