"""Non-max suppression "sharpening" of feature clouds.

The reference greedily walks points in descending saliency and suppresses
everything within a radius (`cfilter.hpp:1183-1312`).  Greedy NMS is
inherently sequential; the TPU version runs the standard fixed-point
iteration of matrix-NMS:

    keep[i]  <-  not exists j: salience_j > salience_i, d_ij < r, keep[j]

starting from keep = valid.  One iteration equals "suppress by any stronger
neighbor" (slightly over-suppressing vs greedy); iterating revives points
whose suppressors were themselves suppressed and converges toward the greedy
solution on suppression chains.  2-3 iterations match greedy on LiDAR
feature clouds to within a few points per thousand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mulls_tpu.ops.neighbors import pairwise_sqdist


def non_max_suppress(xyz: jnp.ndarray, salience: jnp.ndarray,
                     mask: jnp.ndarray, radius: float,
                     iterations: int = 3, chunk: int = 2048) -> jnp.ndarray:
    """Returns the keep mask. Ties broken by index (earlier wins), which
    mirrors the reference's stable sort order."""
    n = xyz.shape[0]
    r2 = radius * radius
    idx = jnp.arange(n, dtype=jnp.int32)  # int: f32 loses exactness >2^24
    # strict priority: larger salience wins; ties -> smaller index wins
    prio = jnp.where(mask, salience, -jnp.inf)

    npad = -n % chunk
    xyz_p = jnp.pad(xyz, ((0, npad), (0, 0)))
    prio_p = jnp.pad(prio, (0, npad), constant_values=-jnp.inf)
    idx_p = jnp.pad(idx, (0, npad), constant_values=jnp.iinfo(jnp.int32).max)

    def stronger_neighbor_exists(keep):
        keep_f = keep & mask

        def one_chunk(args):
            qx, qp, qi = args
            d2 = pairwise_sqdist(qx, xyz)
            close = d2 < r2
            stronger = (prio[None, :] > qp[:, None]) | (
                (prio[None, :] == qp[:, None]) & (idx[None, :] < qi[:, None]))
            hit = close & stronger & keep_f[None, :]
            return jnp.any(hit, axis=1)

        sup = jax.lax.map(one_chunk, (xyz_p.reshape(-1, chunk, 3),
                                      prio_p.reshape(-1, chunk),
                                      idx_p.reshape(-1, chunk)))
        return sup.reshape(-1)[:n]

    keep = mask
    for _ in range(iterations):
        keep = mask & ~stronger_neighbor_exists(keep)
    return keep
