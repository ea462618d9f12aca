"""PGO solver crossover benchmark (VERDICT r4 Next #7).

Times the four pose-graph solvers on the SAME drifted-loop graphs at
100 / 400 / 1000 / 4000 nodes:

  * device dense GN/LM  (`pgo.optimize_pose_graph` — ceres selection)
  * device matrix-free CG (`pgo.optimize_pose_graph_cg` — gtsam selection)
  * host dense numpy     (`np_pgo.optimize_pose_graph_np`)
  * host sparse-direct   (`sparse_pgo.optimize_pose_graph_sparse` — g2o)

Graphs: noisy odometry chain + 1 loop edge per ~200 nodes (the submap
bank's operating density).  Device timings are honest (end with a host
fetch); each config takes the best of 3 after a warm-up solve.  Dense
paths are skipped where they stop being feasible (device dense at 4000
nodes = a 24k^2 f32 Hessian per LM iteration; host dense at >=1000 =
O((6M)^3) LAPACK on 2 cores).  Writes docs/PGO_CROSSOVER.json and
prints the markdown table for docs/PERF.md.

Usage: python tools/perf_pgo_crossover.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def build_graph(m: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, m)
    R = 30.0 * np.sqrt(m)  # keep edge lengths ~constant across scales
    gt_t = np.stack([R * np.cos(ang), R * np.sin(ang),
                     np.zeros(m)], -1).astype(np.float32)
    noise = gt_t + np.concatenate(
        [[np.zeros(3)],
         np.cumsum(0.05 * rng.normal(size=(m - 1, 3)), 0)]).astype(np.float32)
    nq = np.zeros((m, 4), np.float32)
    nq[:, 0] = 1.0
    ei = list(range(m - 1))
    ej = list(range(1, m))
    et = [noise[i + 1] - noise[i] for i in range(m - 1)]
    # loop edges every ~200 nodes + the closing edge
    loops = [(0, m - 1)] + [(k, min(k + m // 2, m - 1))
                            for k in range(0, m - m // 2, max(m // 5, 1))]
    for i, j in loops:
        ei.append(i)
        ej.append(j)
        et.append(gt_t[j] - gt_t[i])
    E = len(ei)
    eq = np.zeros((E, 4), np.float32)
    eq[:, 0] = 1.0
    info = np.broadcast_to(np.eye(6, dtype=np.float32), (E, 6, 6)).copy()
    fixed = np.zeros(m, bool)
    fixed[0] = True
    return (noise, nq, np.asarray(ei), np.asarray(ej), np.stack(et),
            eq, info, fixed, gt_t)


def best_of(fn, reps=3):
    fn()  # warm (compile/caches)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--sizes", default="100,400,1000,4000")
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()
    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    import mulls_tpu  # noqa: F401  (re-honors JAX_PLATFORMS)
    import jax
    import jax.numpy as jnp
    from mulls_tpu.backend.np_pgo import optimize_pose_graph_np
    from mulls_tpu.backend.pgo import (PoseGraph, optimize_pose_graph,
                                       optimize_pose_graph_cg)
    from mulls_tpu.backend.sparse_pgo import optimize_pose_graph_sparse

    backend = jax.default_backend()
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for m in sizes:
        (nt, nq, ei, ej, et, eq, info, fixed, gt_t) = build_graph(m)
        E = len(ei)
        graph = PoseGraph(
            node_t=jnp.asarray(nt), node_q=jnp.asarray(nq),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_t=jnp.asarray(et), edge_q=jnp.asarray(eq),
            edge_info=jnp.asarray(info), edge_mask=jnp.ones(E, bool),
            fixed=jnp.asarray(fixed))
        row = {"nodes": m, "edges": E}
        if m <= 1000:  # device dense: 24k^2 Hessian at 4000 — infeasible
            def run_dense():
                t, q, chi = optimize_pose_graph(graph,
                                                iterations=args.iters)
                np.asarray(t)
                return chi
            row["device_dense_s"] = round(best_of(run_dense), 4)
            row["device_dense_chi2"] = float(np.asarray(
                optimize_pose_graph(graph, iterations=args.iters)[2]))

        def run_cg():
            t, q, chi = optimize_pose_graph_cg(graph, iterations=args.iters,
                                               cg_iters=100)
            np.asarray(t)
            return chi
        row["device_cg_s"] = round(best_of(run_cg), 4)
        row["device_cg_chi2"] = float(np.asarray(
            optimize_pose_graph_cg(graph, iterations=args.iters,
                                   cg_iters=100)[2]))

        if m <= 400:  # host dense: O((6M)^3) LAPACK
            row["host_dense_s"] = round(best_of(
                lambda: optimize_pose_graph_np(
                    nt, nq, ei, ej, et, eq, info, fixed,
                    iterations=args.iters)), 4)

        def run_sparse():
            t, q, chi = optimize_pose_graph_sparse(
                nt, nq, ei, ej, et, eq, info, fixed,
                iterations=args.iters, robust_kernel=False)
            return chi
        row["host_sparse_s"] = round(best_of(run_sparse), 4)
        row["host_sparse_chi2"] = float(run_sparse())
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"backend": backend, "iters": args.iters, "rows": rows}
    path = os.path.join(_REPO, "docs", "PGO_CROSSOVER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    # markdown
    print("\n| nodes | edges | device dense | device CG | host dense "
          "(np) | host sparse (g2o) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        fmt = lambda k: (f"{r[k]*1e3:.0f} ms" if k in r else "—")
        print(f"| {r['nodes']} | {r['edges']} | {fmt('device_dense_s')} | "
              f"{fmt('device_cg_s')} | {fmt('host_dense_s')} | "
              f"{fmt('host_sparse_s')} |")
    print(f"\nwritten: {path}")


if __name__ == "__main__":
    main()
