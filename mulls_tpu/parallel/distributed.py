"""Multi-host (pod-scale) runtime helpers — the inter-host axis the
reference never had (SURVEY.md §5.8: its only parallelism was intra-process
OpenMP, `cfilter.hpp:1829-1830`).

On a TPU pod each host process sees a slice of the chips; `jax.distributed`
stitches them into one global mesh whose collectives ride ICI.  The
framework's multi-host surfaces are:

* multi-sequence odometry — sequences sharded over the global ``data``
  axis (`parallel/multiseq.py`), each host feeding its local shard;
* sharded pose-graph optimization — per-edge Hessian blocks psum-reduced
  across hosts (`backend/pgo.py optimize_pose_graph_sharded`).

Single-process runs (including the CPU-mesh tests) work unchanged: every
helper degrades to a no-op / local behavior when unconfigured.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Initialize `jax.distributed` when multi-host coordinates are
    available; returns True if a multi-process runtime was set up.

    Resolution order: explicit args > ``MULLS_TPU_COORDINATOR`` /
    ``MULLS_TPU_NUM_PROCESSES`` / ``MULLS_TPU_PROCESS_ID`` env vars > TPU
    pod auto-detection (arg-less ``jax.distributed.initialize`` succeeds
    on Cloud TPU VMs).  Single host, nothing configured -> no-op.
    """
    coordinator = coordinator or os.environ.get("MULLS_TPU_COORDINATOR")
    if num_processes is None:
        n = os.environ.get("MULLS_TPU_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("MULLS_TPU_PROCESS_ID")
        process_id = int(p) if p else None
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES"):  # pod slice auto-config
        try:
            jax.distributed.initialize()
            return True
        except Exception:  # single-host tunnel / backend already live
            pass
    return False


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over ALL global devices (every host's chips)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def process_slice(n_items: int) -> Tuple[int, int]:
    """[begin, end) range of a globally-indexed work list owned by this
    process — contiguous block partitioning, used to decide which sequence
    folders this host reads from disk."""
    p = jax.process_count()
    i = jax.process_index()
    per = (n_items + p - 1) // p
    return min(i * per, n_items), min((i + 1) * per, n_items)


def shard_sequences(datasets: List, mesh: Mesh) -> List:
    """Pad a sequence list to a multiple of the mesh size by repeating the
    last dataset (idle shards; results for the padding are discarded by the
    caller via the returned true count)."""
    n = mesh.devices.size
    out = list(datasets)
    while len(out) % n:
        out.append(datasets[-1])
    return out
