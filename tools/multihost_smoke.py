"""Multi-PROCESS (multi-host) smoke test — SURVEY.md §4/§5.8.

The virtual 8-device CPU mesh in tests exercises multi-DEVICE sharding but
never crosses a process boundary; this tool executes the actual
`jax.distributed` path: it spawns TWO local worker processes (CPU backend,
4 virtual devices each -> one 8-device GLOBAL mesh), initializes them
through `parallel/distributed.py initialize_from_env` (the env-var route a
pod launcher would use), and runs

  A. runtime assertions: process_count == 2, 8 global / 4 local devices;
  B. sharded-PGO equivalence: `optimize_pose_graph_sharded` over the
     2-process global mesh against the single-device `optimize_pose_graph`
     on a 64-node / padded-edge drifted loop graph — the psum-reduced
     normal equations must cross the process boundary and still match;
  C. multi-sequence odometry: 8 distinct synthetic sequences sharded over
     the global mesh via `MultiSeqPipeline` (4 per process), per-sequence
     drift asserted against ground truth — frames are uploaded by BOTH
     processes and results allgathered back.

Usage:  python tools/multihost_smoke.py            # launcher
        (workers are respawned copies of this file, selected by env)

Writes docs/MULTIHOST_r05.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
def _free_port() -> int:
    """Pick a free TCP port at launch (bind 0, read it back) so two
    concurrent smoke runs — or a stale worker holding a hard-coded port —
    cannot collide."""
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker() -> None:
    sys.path.insert(0, _REPO)
    import mulls_tpu  # noqa: F401 — re-honors JAX_PLATFORMS=cpu first
    import jax
    import numpy as np

    from mulls_tpu.parallel.distributed import (global_mesh,
                                                initialize_from_env,
                                                process_slice)

    t0 = time.time()
    assert initialize_from_env(), "env coordinates set but init returned False"
    pid = jax.process_index()

    def log(msg):
        print(f"[worker {pid}] {msg}", flush=True)

    out = {}
    # --- A. runtime shape ------------------------------------------------
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    lo, hi = process_slice(8)
    assert (lo, hi) == ((0, 4) if pid == 0 else (4, 8)), (lo, hi)
    out["processes"] = jax.process_count()
    out["global_devices"] = jax.device_count()
    out["local_devices"] = jax.local_device_count()
    log(f"init ok: {jax.process_count()} processes x "
        f"{jax.local_device_count()} devices = {jax.device_count()} global")

    mesh = global_mesh()

    # --- B. sharded PGO == local PGO across the process boundary ---------
    import jax.numpy as jnp
    from mulls_tpu.backend.pgo import (PoseGraph, optimize_pose_graph,
                                       optimize_pose_graph_sharded)
    rng = np.random.default_rng(11)
    m = 64
    ang = np.linspace(0, 2 * np.pi, m)
    gt_t = np.stack([25 * np.cos(ang), 25 * np.sin(ang),
                     np.zeros(m)], -1).astype(np.float32)
    noise_t = gt_t + np.concatenate(
        [[np.zeros(3)],
         np.cumsum(0.06 * rng.normal(size=(m - 1, 3)), 0)]).astype(np.float32)
    node_q = np.zeros((m, 4), np.float32)
    node_q[:, 0] = 1.0
    ei = list(range(m - 1))
    ej = list(range(1, m))
    et = [noise_t[i + 1] - noise_t[i] for i in range(m - 1)]
    for _ in range(60):
        a = int(rng.integers(0, m - 20))
        b = int(rng.integers(a + 10, min(a + 40, m)))
        ei.append(a)
        ej.append(b)
        et.append(gt_t[b] - gt_t[a])
    E = len(ei)
    pad = (-E) % 8
    qe = np.zeros((E + pad, 4), np.float32)
    qe[:, 0] = 1.0
    graph = PoseGraph(
        node_t=jnp.asarray(noise_t), node_q=jnp.asarray(node_q),
        edge_i=jnp.asarray(np.pad(ei, (0, pad)), jnp.int32),
        edge_j=jnp.asarray(np.pad(ej, (0, pad)), jnp.int32),
        edge_t=jnp.asarray(np.pad(np.stack(et), ((0, pad), (0, 0)))),
        edge_q=jnp.asarray(qe),
        edge_info=jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32),
                                   (E + pad, 6, 6)),
        edge_mask=jnp.asarray([True] * E + [False] * pad),
        fixed=jnp.asarray([True] + [False] * (m - 1)))
    t_loc, q_loc, chi_loc = optimize_pose_graph(graph, iterations=20,
                                                robust_kernel=True)
    t_sh, q_sh, chi_sh = optimize_pose_graph_sharded(
        graph, mesh, iterations=20, robust_kernel=True)
    # t_sh is replicated (out_specs P()) but spans processes, so it is not
    # fully addressable; any local shard holds the complete value
    t_sh_np = np.asarray(t_sh.addressable_data(0))
    t_loc_np = np.asarray(t_loc)
    d_nodes = float(np.abs(t_sh_np - t_loc_np).max())
    assert d_nodes < 5e-2, f"sharded vs local PGO node delta {d_nodes}"
    err_before = float(np.linalg.norm(noise_t - gt_t, axis=1).max())
    err_after = float(np.linalg.norm(t_sh_np - gt_t, axis=1).max())
    assert err_after < 0.5 * err_before, (err_before, err_after)
    out["pgo_nodes"] = m
    out["pgo_edges"] = E
    out["pgo_node_delta_m"] = round(d_nodes, 6)
    out["pgo_drift_before_m"] = round(err_before, 3)
    out["pgo_drift_after_m"] = round(err_after, 3)
    log(f"cross-process sharded PGO ok: delta {d_nodes:.2e} m, "
        f"drift {err_before:.2f} -> {err_after:.2f} m")

    # --- C. 8 sequences sharded over the 2-process mesh ------------------
    sys.path.insert(0, _REPO)
    import __graft_entry__ as ge
    from mulls_tpu.parallel.multiseq import MultiSeqPipeline

    cfg = ge._small_cfg()
    n_frames = 16

    class _ListDs(list):
        pass

    datasets, gts = [], []
    for s in range(8):
        world = ge._make_world(300 + s)
        rng = np.random.default_rng(300 + s)
        gt, yaw = [], 0.0
        for k in range(n_frames):
            yaw += np.radians(0.5 + 0.25 * s) * min(1.0, k / 6.0)
            T = np.eye(4)
            R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                          [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
            T[:3, :3] = R
            if k:
                T[:3, 3] = gt[-1][:3, 3] + R @ np.array(
                    [0.5 * min(1.0, k / 6.0), 0, 0])
            gt.append(T)
        gts.append(np.stack(gt))
        datasets.append(_ListDs(ge._render_scan(world, p, cfg, rng)
                                for p in gt))
    pipe = MultiSeqPipeline(cfg, mesh, segment=8)
    results = pipe.run(datasets)
    drifts = []
    for s, r in enumerate(results):
        assert all(c == 1 for c in r.codes), (s, r.codes)
        gl = np.einsum("ij,njk->nik", np.linalg.inv(gts[s][0]), gts[s])
        drifts.append(float(np.linalg.norm(
            r.poses[:, :3, 3] - gl[:, :3, 3], axis=1).max()))
    assert max(drifts) < 0.5, f"per-sequence max position errors {drifts}"
    out["multiseq_sequences"] = 8
    out["multiseq_frames"] = n_frames
    out["multiseq_max_drift_m"] = [round(d, 3) for d in drifts]
    log(f"cross-process multiseq ok: 8 sequences x {n_frames} frames, "
        f"max drifts {np.round(drifts, 3).tolist()}")

    out["wall_s"] = round(time.time() - t0, 1)
    if pid == 0:
        print("MULTIHOST_RESULT " + json.dumps(out), flush=True)


def launcher() -> int:
    env_base = dict(os.environ)
    env_base.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cpu_cache",
        "MULLS_TPU_COORDINATOR": f"localhost:{_free_port()}",
        "MULLS_TPU_NUM_PROCESSES": "2",
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["MULLS_TPU_PROCESS_ID"] = str(pid)
        env["MULLS_MULTIHOST_WORKER"] = "1"
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    rc = 0
    for pid, p in enumerate(procs):
        try:
            o, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
            o += "\n[launcher] TIMEOUT"
            rc = 1
        outs.append(o)
        rc = rc or p.returncode
        print(f"----- worker {pid} (rc={p.returncode}) -----\n{o}",
              flush=True)
    result = {"ok": rc == 0, "rc": rc}
    for line in outs[0].splitlines():
        if line.startswith("MULTIHOST_RESULT "):
            result.update(json.loads(line[len("MULTIHOST_RESULT "):]))
    path = os.path.join(_REPO, "docs", "MULTIHOST_r05.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[launcher] wrote {path}: ok={result['ok']}", flush=True)
    return rc


if __name__ == "__main__":
    if os.environ.get("MULLS_MULTIHOST_WORKER"):
        worker()
    else:
        sys.exit(launcher())
