"""Neighborhood queries without kd-trees — the load-bearing TPU design.

Every nearest-neighbor / radius query in the reference (PCA neighborhoods
`pca.hpp:294-354`, ICP correspondences `cregistration.hpp:1701-1835`, dynamic
removal `map_manager.cpp:145-256`) is replaced by tiled brute-force distance
computation on the MXU:

* :func:`radius_moments` — for radius-PCA we never materialize neighbor
  lists.  PCA needs only *sums* over the neighborhood (count, Σx, Σxxᵀ), and
  any per-point attribute sum (class one-hots for the NCC descriptor) is the
  same masked matmul: ``S = A @ F`` where ``A`` is the [Q, P] 0/1 adjacency
  from a tiled distance computation and ``F`` is a [P, 10+F] feature stack.
  This turns the reference's pointer-chasing kd-tree walks into dense
  matmuls with a [Q, P] working set that is tiled over P-chunks.
* :func:`nearest_neighbor` — tiled 1-NN with a running (dist, idx) argmin.

Workloads (KITTI config): PCA is 20k x 20k (~16 GFLOP/frame in f32), ICP
correspondence is ~2.6k x 20k per iteration — both MXU-bound, not
bandwidth-bound, because the chunked distance tile stays in registers/VMEM
between the compare and the moment matmul after XLA fusion.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 3.0e38


def use_pallas() -> bool:
    """Pallas kernels on real TPU; plain-XLA path elsewhere (the kernels
    also run under ``interpret=True`` for CPU parity tests).  Override with
    MULLS_TPU_PALLAS=0|1."""
    env = os.environ.get("MULLS_TPU_PALLAS", "auto")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def _pad_rows(x: jnp.ndarray, n: int):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def pairwise_sqdist(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """[Q,3] x [P,3] -> [Q,P] squared distances (f32 matmul path)."""
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1, keepdims=True).T
    cross = q @ p.T
    return jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)


def radius_moments(
    q_xyz: jnp.ndarray,
    q_mask: jnp.ndarray,
    p_xyz: jnp.ndarray,
    p_mask: jnp.ndarray,
    radius: jnp.ndarray,
    p_feats: Optional[jnp.ndarray] = None,
    close_fraction_sq: Optional[float] = None,
    close_r2: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
    count_only: bool = False,
    matmul_dtype: str = "f32",
) -> dict:
    """Masked neighborhood sums for all queries.

    Args:
      q_xyz/q_mask: [Q,3]/[Q] query points.
      p_xyz/p_mask: [P,3]/[P] support points.
      radius: scalar or [Q] per-query radius (distance-adaptive PCA,
        `pca.hpp:314-324`).
      p_feats: optional [P,F] per-support features to sum over neighbors.
      close_fraction_sq: if set (e.g. 0.64 per `pca.hpp:338`), also returns
        sums over the "close" sub-neighborhood d^2 < frac * r^2.
      close_r2: alternative to close_fraction_sq — absolute squared close
        radius, scalar or [Q] (the close set is d^2 <= min(r^2, close_r2)).

    Returns dict with:
      count [Q], sum_xyz [Q,3], sum_outer [Q,6] (xx,xy,xz,yy,yz,zz),
      feat_sum [Q,F] (if p_feats), and close_count / close_feat_sum
      (if close_fraction_sq / close_r2).
    """
    qn = q_xyz.shape[0]
    r2 = jnp.broadcast_to(jnp.asarray(radius, jnp.float32) ** 2, (qn,))
    if close_r2 is None and close_fraction_sq is not None:
        close_r2 = close_fraction_sq * r2
    with_close = close_r2 is not None
    if with_close:
        close_r2 = jnp.broadcast_to(jnp.asarray(close_r2, jnp.float32), (qn,))

    x, y, z = p_xyz[:, 0], p_xyz[:, 1], p_xyz[:, 2]
    if count_only:
        # skip the 9 coordinate-moment columns (callers that only consume
        # count/feat_sum, e.g. the NCC descriptor passes); this is also the
        # mode where matmul_dtype="bf16" is safe — no squared-coordinate
        # magnitudes in the stack
        cols = [jnp.ones_like(x)]
    else:
        cols = [jnp.ones_like(x), x, y, z,
                x * x, x * y, x * z, y * y, y * z, z * z]
    n_base = len(cols)
    nf = 0
    if p_feats is not None:
        nf = p_feats.shape[1]
        cols.append(p_feats.astype(jnp.float32))
    feat_stack = jnp.concatenate(
        [c[:, None] if c.ndim == 1 else c for c in cols], axis=1)  # [P, 10+F]
    pmask_f = p_mask.astype(jnp.float32)

    def build_out(sums, csums):
        out = {"count": sums[:, 0]}
        if not count_only:
            out["sum_xyz"] = sums[:, 1:4]
            out["sum_outer"] = sums[:, 4:10]
        if p_feats is not None:
            out["feat_sum"] = sums[:, n_base:]
        if with_close:
            out["close_count"] = csums[:, 0]
            if p_feats is not None:
                out["close_feat_sum"] = csums[:, n_base:]
        return out

    if use_pallas():
        from mulls_tpu.ops.kernels import moments_pallas
        sums, csums = moments_pallas(
            q_xyz, p_xyz, p_mask, r2, feat_stack, close_r2,
            with_close=with_close, matmul_dtype=matmul_dtype)
        qmask_f = q_mask.astype(jnp.float32)[:, None]
        return build_out(sums * qmask_f,
                         csums * qmask_f if with_close else csums)

    qpad = -qn % chunk
    q_xyz_p = _pad_rows(q_xyz, qn + qpad).reshape(-1, chunk, 3)
    q_mask_p = _pad_rows(q_mask, qn + qpad).reshape(-1, chunk)
    r2_p = _pad_rows(r2, qn + qpad).reshape(-1, chunk)
    cr2_p = (_pad_rows(close_r2, qn + qpad).reshape(-1, chunk)
             if with_close else jnp.zeros_like(r2_p))

    def one_chunk(args):
        qc, qm, r2c, cr2c = args
        d2 = pairwise_sqdist(qc, p_xyz)  # [chunk, P]
        adj = (d2 <= r2c[:, None]).astype(jnp.float32) * pmask_f[None, :]
        adj = adj * qm[:, None].astype(jnp.float32)
        sums = adj @ feat_stack  # [chunk, 10+F]
        if with_close:
            close = (d2 <= cr2c[:, None]).astype(jnp.float32)
            close = close * adj
            csums = close @ feat_stack
            return sums, csums
        return sums, jnp.zeros((qc.shape[0], 0), jnp.float32)

    sums, csums = jax.lax.map(one_chunk, (q_xyz_p, q_mask_p, r2_p, cr2_p))
    sums = sums.reshape(-1, sums.shape[-1])[:qn]
    csums = csums.reshape(-1, csums.shape[-1])[:qn] if with_close else csums
    return build_out(sums, csums)


def cov_from_moments(count: jnp.ndarray, sum_xyz: jnp.ndarray,
                     sum_outer: jnp.ndarray) -> jnp.ndarray:
    """[Q] count, [Q,3] Σx, [Q,6] Σ(xxᵀ upper) -> [Q,3,3] covariance."""
    n = jnp.maximum(count, 1.0)[:, None]
    mean = sum_xyz / n
    exx = sum_outer / n[:, :1]
    xx, xy, xz, yy, yz, zz = (exx[:, i] for i in range(6))
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    c = jnp.stack([
        xx - mx * mx, xy - mx * my, xz - mx * mz,
        xy - mx * my, yy - my * my, yz - my * mz,
        xz - mx * mz, yz - my * mz, zz - mz * mz,
    ], axis=-1).reshape(-1, 3, 3)
    return c


@partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(q_xyz: jnp.ndarray, q_mask: jnp.ndarray,
                     p_xyz: jnp.ndarray, p_mask: jnp.ndarray,
                     chunk: int = 2048) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled brute-force 1-NN: returns (idx [Q] int32, sqdist [Q] f32).
    Invalid queries / empty support get sqdist = +inf-like sentinel."""
    if use_pallas():
        from mulls_tpu.ops.kernels import nn_pallas
        return nn_pallas(q_xyz, q_mask, p_xyz, p_mask)
    qn = q_xyz.shape[0]
    qpad = -qn % chunk
    q_xyz_p = _pad_rows(q_xyz, qn + qpad).reshape(-1, chunk, 3)
    inval = jnp.where(p_mask, 0.0, _BIG)[None, :]

    def one_chunk(qc):
        d2 = pairwise_sqdist(qc, p_xyz) + inval
        idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(d2, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        return idx, best

    idx, best = jax.lax.map(one_chunk, q_xyz_p)
    idx = idx.reshape(-1)[:qn]
    best = best.reshape(-1)[:qn]
    best = jnp.where(q_mask, best, _BIG)
    return idx, best


def normal_shooting_neighbor(q_xyz: jnp.ndarray, q_dir: jnp.ndarray,
                             q_mask: jnp.ndarray, p_xyz: jnp.ndarray,
                             p_mask: jnp.ndarray, gate_r,
                             chunk: int = 2048
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normal-shooting correspondence: for each query, the support point
    with minimum PERPENDICULAR distance to the line through the query
    along its normal, among supports within ``gate_r`` Euclidean.

    Parity target: `cregistration.hpp:1729-1737` uses PCL's
    CorrespondenceEstimationNormalShooting (min perpendicular distance
    among the 10 Euclidean nearest neighbors, gated at 2.5x dis_thre).
    TPU redesign: instead of a k-NN list the perpendicular distance is
    scored directly for every in-gate support — perp^2 = d^2 - ((p-q).n)^2
    costs one extra [Q,P] matmul next to the distance matmul, and the
    min-perp choice over the full gate ball is the k->inf limit of PCL's
    candidate set.  Returns (idx [Q] i32, EUCLIDEAN sqdist [Q] f32 of the
    chosen pair — downstream threshold gates and weights consume Euclidean
    distance exactly like the 1-NN path).
    """
    qn = q_xyz.shape[0]
    gate2 = jnp.asarray(gate_r, jnp.float32) ** 2
    qpad = -qn % chunk
    q_xyz_p = _pad_rows(q_xyz, qn + qpad).reshape(-1, chunk, 3)
    q_dir_p = _pad_rows(q_dir, qn + qpad).reshape(-1, chunk, 3)
    inval = jnp.where(p_mask, 0.0, _BIG)[None, :]

    def one_chunk(args):
        qc, nc = args
        d2 = pairwise_sqdist(qc, p_xyz)
        # (p - q) . n  =  p.n - q.n   (one matmul + a row constant)
        proj = nc @ p_xyz.T - jnp.sum(nc * qc, axis=-1, keepdims=True)
        perp2 = jnp.maximum(d2 - proj * proj, 0.0)
        score = perp2 + jnp.where(d2 > gate2, _BIG, 0.0) + inval
        idx = jnp.argmin(score, axis=1).astype(jnp.int32)
        best_d2 = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
        best_sc = jnp.take_along_axis(score, idx[:, None], axis=1)[:, 0]
        # no support inside the gate: report the sentinel so the caller's
        # distance gates reject the pair
        best_d2 = jnp.where(best_sc >= _BIG, _BIG, best_d2)
        return idx, best_d2

    idx, best = jax.lax.map(one_chunk, (q_xyz_p, q_dir_p))
    idx = idx.reshape(-1)[:qn]
    best = best.reshape(-1)[:qn]
    best = jnp.where(q_mask, best, _BIG)
    return idx, best


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_class_counts(q_xyz: jnp.ndarray, q_mask: jnp.ndarray,
                     p_xyz: jnp.ndarray, p_mask: jnp.ndarray,
                     radius: jnp.ndarray, k: int,
                     class_onehot: jnp.ndarray,
                     p_intensity: jnp.ndarray,
                     close_r2: float,
                     chunk: int = 256) -> dict:
    """K-capped radius neighborhood category statistics.

    Parity target: the reference's ``radiusSearch(..., max_nn=k)``
    neighborhoods (`pca.hpp:326`) consumed by ``encode_stable_points``
    (`cfilter.hpp:1093-1163`) consider (at most) the K NEAREST support
    points within ``radius``.  The cap matters: normalizing category
    percentages by the full in-radius count dilutes the descriptor in
    dense areas until featureless keypoints all look alike and NCC
    matching collapses.

    Round-2 redesign: the exact per-chunk ``top_k`` over a [chunk, P]
    distance block cost ~13 ms/frame on the MXU-starved VPU.  Instead the
    cap is realized statistically by a TWO-PASS radius shrink through the
    fused moments kernel: pass 1 measures the in-radius density, pass 2
    re-measures with the radius scaled so the expected count equals K
    (surface scaling: count grows ~r^2 on LiDAR feature neighborhoods, so
    r'^2 = r^2 * K/count).  The close/far split keeps the reference's
    absolute 0.64 r_base^2 boundary; when the shrunk radius falls inside
    it every neighbor counts as close — exactly what the K-nearest cap
    does in dense areas.

    Returns dict with ``count [Q]``, ``close_counts [Q,C]``,
    ``far_counts [Q,C]`` (split at d^2 < close_r2, the reference's
    0.64 r_base^2, `pca.hpp:338`), ``int_sum [Q]``.
    """
    qn = q_xyz.shape[0]
    r2 = jnp.broadcast_to(jnp.asarray(radius, jnp.float32) ** 2, (qn,))
    m1 = radius_moments(q_xyz, q_mask, p_xyz, p_mask,
                        jnp.broadcast_to(jnp.asarray(radius, jnp.float32),
                                         (qn,)), chunk=chunk,
                        count_only=True, matmul_dtype="bf16")
    count1 = jnp.maximum(m1["count"], 1.0)
    r2s = r2 * jnp.minimum(1.0, jnp.float32(k) / count1)
    # category one-hots and small-int intensities are bf16-exact; the
    # count-only stack carries no squared-coordinate columns
    feats = jnp.concatenate(
        [class_onehot.astype(jnp.float32), p_intensity[:, None]], axis=1)
    m2 = radius_moments(q_xyz, q_mask, p_xyz, p_mask, jnp.sqrt(r2s),
                        p_feats=feats,
                        close_r2=jnp.minimum(jnp.float32(close_r2), r2s),
                        chunk=chunk, count_only=True, matmul_dtype="bf16")
    nC = class_onehot.shape[-1]
    total_c = m2["feat_sum"][:, :nC]
    close_c = m2["close_feat_sum"][:, :nC]
    return {
        "count": m2["count"] * q_mask,
        "close_counts": close_c * q_mask[:, None],
        "far_counts": (total_c - close_c) * q_mask[:, None],
        "int_sum": m2["feat_sum"][:, nC] * q_mask,
    }
