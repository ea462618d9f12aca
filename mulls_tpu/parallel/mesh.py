"""Multi-chip sharding layer (SURVEY.md §5.7-5.8 mapping).

The reference is single-process OpenMP; the TPU framework's parallel axes
are:

* **per-chip**: point/voxel data parallelism inside each kernel (free —
  XLA vectorizes the fixed-shape tensors);
* **multi-chip `data` axis**: batches of registration problems (offline
  odometry segments, map-to-map loop-closure candidates, multi-session
  alignment) sharded over a `jax.sharding.Mesh` via `shard_map`;
* **back-end collectives**: the pose-graph normal equations are reduced
  with `psum` — every device computes the 6x6-block Hessian contributions
  of its local edges, the reduced system is solved replicated (dense
  Cholesky on the MXU).

This module provides the mesh helpers plus `distributed_slam_step`, the
full multi-chip step (sharded batched MULLS-ICP -> psum-reduced pose-graph
Gauss-Newton update) used by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mulls_tpu.config import RegConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import FeatureCloud
from mulls_tpu.frontend.icp import mm_lls_icp
from mulls_tpu.backend.pgo import _edge_res_and_jac


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data"
              ) -> Mesh:
    devs = jax.devices()
    if n_devices and len(devs) < n_devices:
        # fall back to the (possibly virtualized) CPU backend — used by the
        # multi-chip dry run on hosts with a single accelerator
        devs = jax.devices("cpu")
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def batched_icp(sources: Dict[str, FeatureCloud],
                targets: Dict[str, FeatureCloud],
                guesses: jnp.ndarray, cfg: RegConfig, max_iter: int):
    """vmap MULLS-ICP over a leading batch axis of cloud pytrees."""
    fn = lambda s, t, g: mm_lls_icp(s, t, cfg, g, max_iter)
    return jax.vmap(fn)(sources, targets, guesses)


def distributed_slam_step(mesh: Mesh, cfg: RegConfig, max_iter: int,
                          num_nodes: int, axis_name: str = "data"):
    """Builds the jitted multi-chip step.

    Inputs (leading batch axis = registration pairs, sharded over the mesh):
      sources/targets: pytrees of FeatureCloud batches
      guesses: [B, 4, 4]
      edge_i/edge_j: [B] node ids of each pair (replicated node state)
      node_t [M, 3], node_q [M, 4]

    Per step: every device registers its local pairs (MULLS-ICP), forms the
    pose-graph Hessian contributions of its local edges, `psum`s the reduced
    system over the mesh, and applies one replicated Gauss-Newton update.
    Returns (node_t', node_q', transforms, sigmas).
    """

    def step(sources, targets, guesses, edge_i, edge_j, node_t, node_q):
        res = batched_icp(sources, targets, guesses, cfg, max_iter)
        T = res.transform  # [b, 4, 4] local

        t_meas = T[:, :3, 3]
        q_meas = se3.quat_from_rotation(T[:, :3, :3])
        ta, qa = node_t[edge_i], node_q[edge_i]
        tb, qb = node_t[edge_j], node_q[edge_j]
        r, Ja, Jb = jax.vmap(_edge_res_and_jac)(ta, qa, tb, qb, t_meas, q_meas)
        w = jnp.where(res.process_code == 1, 1.0, 0.0)

        m = num_nodes
        Haa = jnp.einsum("e,eki,ekj->eij", w, Ja, Ja)
        Hbb = jnp.einsum("e,eki,ekj->eij", w, Jb, Jb)
        Hab = jnp.einsum("e,eki,ekj->eij", w, Ja, Jb)
        ga = jnp.einsum("e,eki,ek->ei", w, Ja, r)
        gb = jnp.einsum("e,eki,ek->ei", w, Jb, r)
        H = jnp.zeros((m, 6, m, 6), jnp.float32)
        H = H.at[edge_i, :, edge_i, :].add(Haa)
        H = H.at[edge_j, :, edge_j, :].add(Hbb)
        H = H.at[edge_i, :, edge_j, :].add(Hab)
        H = H.at[edge_j, :, edge_i, :].add(jnp.swapaxes(Hab, -1, -2))
        g = jnp.zeros((m, 6), jnp.float32).at[edge_i].add(ga).at[edge_j].add(gb)

        # the collective: reduce the normal equations over the mesh
        H = jax.lax.psum(H, axis_name)
        g = jax.lax.psum(g, axis_name)

        Hd = H.reshape(m * 6, m * 6)
        # pin node 0 (gauge freedom) + damping
        pin = jnp.zeros((m,), jnp.float32).at[0].set(1e9)
        Hd = Hd + jnp.diag(jnp.repeat(pin, 6)) \
            + 1e-4 * jnp.eye(m * 6, dtype=jnp.float32)
        delta = jnp.linalg.solve(Hd, -g.reshape(-1)).reshape(m, 6)
        dq = jnp.concatenate([jnp.ones((m, 1), jnp.float32),
                              0.5 * delta[:, 3:6]], axis=1)
        node_q_new = se3.quat_mul(dq, node_q)
        node_q_new = node_q_new / jnp.linalg.norm(node_q_new, axis=-1,
                                                  keepdims=True)
        node_t_new = node_t + delta[:, :3]
        return node_t_new, node_q_new, T, res.sigma

    cloud_spec = P(axis_name)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(cloud_spec, cloud_spec, cloud_spec, cloud_spec,
                  cloud_spec, P(), P()),
        out_specs=(P(), P(), cloud_spec, cloud_spec),
        check_vma=False)
    return jax.jit(sharded)
