"""End-of-run trajectory refinement (`mulls_slam.cpp:832-931`).

Two modes, mirroring the reference:

* :func:`inner_submap_refine` — the default "option B": for every submap,
  optimize the member frames' poses with both endpoint frames FIXED to
  their (loop-closure-corrected) values and adjacent-frame odometry edges
  in between (`mulls_slam.cpp:876-927`, dense-schur small problems).  This
  re-distributes each submap's loop-closure correction smoothly over its
  interior frames.
* :func:`framewise_pgo` — "option A": one graph over ALL frames with
  adjacent odometry edges everywhere plus the submap registration edges
  applied between member frames (`mulls_slam.cpp:835-875`).
"""

from __future__ import annotations

import contextlib
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mulls_tpu.backend.pgo import PoseGraph, optimize_pose_graph
from mulls_tpu.core import se3


def _on_host_cpu():
    """Run the end-of-run refinement graphs on the HOST CPU backend.

    These are tiny chain graphs (tens of nodes); on the tunneled TPU each
    per-submap solve pays a link round trip, and every new span shape
    triggers a ~30-100 s REMOTE compile — measured 102 s of 'refine' on a
    13 s run (tools/perf_probe_e2e.py, round 3).  On the host CPU the
    compile is local seconds and the solve microseconds."""
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # no cpu backend registered (unusual)
        return contextlib.nullcontext()


def _poses_to_tq(poses: np.ndarray):
    t = poses[:, :3, 3].astype(np.float32)
    q = np.asarray(se3.quat_from_rotation(
        jnp.asarray(poses[:, :3, :3].astype(np.float32))))
    return t, q


def _tq_to_poses(t: np.ndarray, q: np.ndarray) -> np.ndarray:
    n = len(t)
    R = np.asarray(se3.rotation_from_quat(jnp.asarray(q)), np.float64)
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = t.astype(np.float64)
    return out


def _adjacent_edges(poses_odom: np.ndarray, lo: int, hi: int):
    """Relative measurements T_k^-1 T_{k+1} from the raw odometry."""
    idx_i = np.arange(lo, hi)
    T_rel = np.einsum("nij,njk->nik",
                      np.linalg.inv(poses_odom[lo:hi]),
                      poses_odom[lo + 1:hi + 1])
    t = T_rel[:, :3, 3].astype(np.float32)
    q = np.asarray(se3.quat_from_rotation(
        jnp.asarray(T_rel[:, :3, :3].astype(np.float32))))
    return idx_i, t, q


def inner_submap_refine(poses: np.ndarray, poses_odom: np.ndarray,
                        boundaries: Sequence[Tuple[int, int]],
                        iterations: int = 15,
                        t_limit: float = 0.0,
                        r_limit: float = 0.0) -> np.ndarray:
    """Refine interior frame poses submap by submap.

    Args:
      poses: [N,4,4] current frame poses (endpoints already corrected by
        the submap-level PGO).
      poses_odom: [N,4,4] raw odometry poses (source of adjacent-edge
        measurements — the loop-corrected poses would make the edges
        trivially consistent).
      boundaries: (frame_begin, frame_end) inclusive ranges per submap.
    Returns refined [N,4,4] poses.

    Runs entirely on the host through the numpy twin solver
    (`backend/np_pgo.py`) — these are tiny one-shot chain graphs whose
    span shapes vary run to run, and in this container every XLA compile
    (CPU backend included) routes through a remote AOT service: a single
    cold span shape cost 520 s measured.  No compile step may exist on
    this path.
    """
    from mulls_tpu.backend import np_pgo
    out = poses.copy()
    for lo, hi in boundaries:
        if hi - lo < 2:
            continue
        sub = poses[lo:hi + 1]
        t = sub[:, :3, 3]
        q = np_pgo.quat_from_rotation(sub[:, :3, :3])
        m = hi - lo + 1
        T_rel = np.einsum("nij,njk->nik",
                          np.linalg.inv(poses_odom[lo:hi]),
                          poses_odom[lo + 1:hi + 1])
        et = T_rel[:, :3, 3]
        eq = np_pgo.quat_from_rotation(T_rel[:, :3, :3])
        fixed = np.zeros(m, bool)
        fixed[0] = fixed[-1] = True
        # ceres-style growing bounds from the fixed start frame
        # (`--inner_submap_t_limit/-r_limit`, `mulls_slam.cpp:911-915`);
        # a non-positive limit leaves that component unbounded
        tl = rl = None
        if t_limit > 0 or r_limit > 0:
            k = np.arange(m, dtype=np.float64)
            tl = (k * t_limit if t_limit > 0 else np.full(m, np.inf))
            rl = (k * r_limit if r_limit > 0 else np.full(m, np.inf))
        nt, nq, _ = np_pgo.optimize_pose_graph_np(
            t, q, np.arange(m - 1), np.arange(1, m), et, eq,
            np.broadcast_to(np.eye(6), (m - 1, 6, 6)), fixed,
            t_limit=tl, r_limit=rl, iterations=iterations)
        seg = np.tile(np.eye(4), (m, 1, 1))
        seg[:, :3, :3] = np_pgo.rotation_from_quat(nq)
        seg[:, :3, 3] = nt
        out[lo:hi + 1] = seg
    return out


def framewise_pgo(poses_odom: np.ndarray,
                  reg_edges: List[Tuple[int, int, np.ndarray, np.ndarray]],
                  fixed_first: bool = True,
                  iterations: int = 25) -> np.ndarray:
    """Whole-trajectory PGO: adjacent odometry edges + frame-level loop
    registration edges (i, j, T_ij [4,4], info [6,6])."""
    with _on_host_cpu():
        return _framewise_pgo(poses_odom, reg_edges, fixed_first,
                              iterations)


def _framewise_pgo(poses_odom, reg_edges, fixed_first, iterations
                   ) -> np.ndarray:
    n = len(poses_odom)
    t, q = _poses_to_tq(poses_odom)
    ei, et, eq = _adjacent_edges(poses_odom, 0, n - 1)
    e_i = [ei]
    e_j = [ei + 1]
    e_t = [et]
    e_q = [eq]
    infos = [np.broadcast_to(np.eye(6, dtype=np.float32), (n - 1, 6, 6))]
    for (i, j, T_ij, info) in reg_edges:
        e_i.append(np.asarray([i]))
        e_j.append(np.asarray([j]))
        e_t.append(T_ij[None, :3, 3].astype(np.float32))
        e_q.append(np.asarray(se3.quat_from_rotation(
            jnp.asarray(T_ij[None, :3, :3].astype(np.float32)))))
        infos.append(info[None].astype(np.float32))
    fixed = np.zeros(n, bool)
    if fixed_first:
        fixed[0] = True
    graph = PoseGraph(
        node_t=jnp.asarray(t), node_q=jnp.asarray(q),
        edge_i=jnp.asarray(np.concatenate(e_i), jnp.int32),
        edge_j=jnp.asarray(np.concatenate(e_j), jnp.int32),
        edge_t=jnp.asarray(np.concatenate(e_t)),
        edge_q=jnp.asarray(np.concatenate(e_q)),
        edge_info=jnp.asarray(np.concatenate(infos)),
        edge_mask=jnp.ones(sum(len(x) for x in e_i), bool),
        fixed=jnp.asarray(fixed))
    if n > 256:
        # frame-scale graphs (KITTI-00 is 4541 nodes): the dense solver
        # materializes the (6n)^2 Hessian — use the matrix-free
        # edge-local CG path (`pgo.optimize_pose_graph_cg`) instead
        from mulls_tpu.backend.pgo import optimize_pose_graph_cg
        nt, nq, _ = optimize_pose_graph_cg(graph, iterations=iterations,
                                           robust_kernel=True)
    else:
        nt, nq, _ = optimize_pose_graph(graph, iterations=iterations,
                                        robust_kernel=True)
    return _tq_to_poses(np.asarray(nt), np.asarray(nq))
