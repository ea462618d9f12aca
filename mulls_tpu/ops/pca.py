"""Batched neighborhood PCA — the feature engine (reference `pca.hpp`).

The reference runs per-point kd-tree radius-K searches plus `pcl::PCA`
(`pca.hpp:294-434`).  Here the neighborhood second moments come from
:mod:`mulls_tpu.ops.neighbors` (masked matmuls) and the eigenproblem is a
closed-form, fully-vectorized symmetric 3x3 eigendecomposition — no LAPACK,
no loops, runs on the VPU.

Outputs mirror `pca_feature_t` (`pca.hpp:37-54`): eigenvalues λ1≥λ2≥λ3,
principal / normal directions, curvature λ3/Σλ, linearity (λ1-λ2)/λ1,
planarity (λ2-λ3)/λ1 (`pca.hpp:416-430`), neighbor count.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mulls_tpu.ops import neighbors as nbr

_EPS = 1e-12


def _part1by1(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 16 bits of v to even bit positions."""
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_order(xyz: jnp.ndarray, res: float = 4.0) -> jnp.ndarray:
    """Permutation placing spatially-adjacent points in adjacent rows (2D
    Morton curve over ``res``-metre cells).  The PCA moments kernel centers
    support coordinates at each query TILE's mean before the bf16 hi/lo
    split — spatial ordering keeps tile extents to tens of metres so the
    16-bit effective mantissa leaves covariance quantization noise far
    below LiDAR sampling noise."""
    gx = jnp.clip(((xyz[:, 0] + 512.0) / res), 0, 65535).astype(jnp.int32)
    gy = jnp.clip(((xyz[:, 1] + 512.0) / res), 0, 65535).astype(jnp.int32)
    code = (_part1by1(gx) << 1) | _part1by1(gy)
    return jnp.argsort(code)


def eigh_sym3x3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form eigendecomposition of symmetric [..., 3, 3] matrices.

    Returns (eigvals [..., 3] descending, eigvecs [..., 3, 3] with
    eigvecs[..., :, k] the k-th eigenvector), trigonometric method
    (Smith 1961) + cross-product eigenvectors with degeneracy fallbacks.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    isotropic = p2 < 1e-10 * jnp.maximum(q * q, 1e-20)
    vals = jnp.stack([l1, l2, l3], axis=-1)
    vals = jnp.where(isotropic[..., None], jnp.stack([q, q, q], -1), vals)

    def eigvec_for(lam):
        # rows of (A - lam I); eigenvector is orthogonal to two independent
        # rows -> take the largest-norm cross product of row pairs
        r0 = jnp.stack([a00 - lam, a01, a02], -1)
        r1 = jnp.stack([a01, a11 - lam, a12], -1)
        r2 = jnp.stack([a02, a12, a22 - lam], -1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, -1)
        n02 = jnp.sum(c02 * c02, -1)
        n12 = jnp.sum(c12 * c12, -1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
        v = jnp.where((best == 0)[..., None], c01,
                      jnp.where((best == 1)[..., None], c02, c12))
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # degenerate (repeated eigenvalue): fall back to a fixed axis
        fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
        return jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-20), fallback)

    v1 = eigvec_for(l1)
    v3 = eigvec_for(l3)
    # enforce orthogonality: v2 = v3 x v1; re-orthogonalize v3 against v1
    v3 = v3 - jnp.sum(v3 * v1, -1, keepdims=True) * v1
    v3n = jnp.linalg.norm(v3, axis=-1, keepdims=True)
    alt = jnp.cross(v1, jnp.zeros_like(v1).at[..., 0].set(1.0))
    altn = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v1, jnp.zeros_like(v1).at[..., 1].set(1.0))
    alt2n = jnp.linalg.norm(alt2, axis=-1, keepdims=True)
    alt = jnp.where(altn > 1e-6, alt / jnp.maximum(altn, 1e-20),
                    alt2 / jnp.maximum(alt2n, 1e-20))
    v3 = jnp.where(v3n > 1e-6, v3 / jnp.maximum(v3n, 1e-20), alt)
    v2 = jnp.cross(v3, v1)
    vecs = jnp.stack([v1, v2, v3], axis=-1)  # columns
    return vals, vecs


class PcaFeatures(NamedTuple):
    """Per-query PCA features (pca_feature_t parity)."""

    count: jnp.ndarray  # [Q] neighbor count (incl. self)
    eigvals: jnp.ndarray  # [Q, 3] descending
    principal: jnp.ndarray  # [Q, 3] eigvec of λ1
    normal: jnp.ndarray  # [Q, 3] eigvec of λ3
    curvature: jnp.ndarray  # [Q] λ3 / Σλ
    linearity: jnp.ndarray  # [Q] (λ1-λ2)/λ1   (linear_2)
    planarity: jnp.ndarray  # [Q] (λ2-λ3)/λ1   (planar_2)
    sphericity: jnp.ndarray  # [Q] λ3/λ1
    valid: jnp.ndarray  # [Q] bool (count > min_k and query valid)


def pca_features(
    q_xyz: jnp.ndarray,
    q_mask: jnp.ndarray,
    p_xyz: jnp.ndarray,
    p_mask: jnp.ndarray,
    radius: float,
    min_k: int,
    distance_adaptive: bool = False,
    unit_dist: float = 30.0,
    chunk: int = 1024,
) -> PcaFeatures:
    """Radius PCA of every query against the support set.

    Deviation from the reference (documented): the reference caps the
    neighborhood at the K nearest within the radius (`pca.hpp:326`); the
    moment formulation uses *all* points within the radius, which is the
    unbiased version of the same estimate and removes the data-dependent
    gather entirely.
    """
    r = jnp.full((q_xyz.shape[0],), radius, jnp.float32)
    if distance_adaptive:
        # r' = sqrt(d/unit) * r for d > unit (`pca.hpp:314-324`)
        d = jnp.linalg.norm(q_xyz, axis=-1)
        scale = jnp.sqrt(jnp.maximum(d / unit_dist, 1.0))
        r = r * scale
    if nbr.use_pallas():
        # per-tile-centered hi/lo bf16 moments (covariance is
        # shift-invariant); call sites should order queries spatially
        # (morton_order) so tile centers are tight
        from mulls_tpu.ops.kernels import pca_moments_pallas
        cnt, sx, so = pca_moments_pallas(q_xyz, p_xyz, p_mask, r * r)
        qf = q_mask.astype(jnp.float32)
        count = cnt * qf
        cov = nbr.cov_from_moments(count, sx * qf[:, None],
                                   so * qf[:, None])
    else:
        m = nbr.radius_moments(q_xyz, q_mask, p_xyz, p_mask, r, chunk=chunk)
        count = m["count"]
        cov = nbr.cov_from_moments(count, m["sum_xyz"], m["sum_outer"])
    vals, vecs = eigh_sym3x3(cov)
    vals = jnp.maximum(vals, 0.0)
    s = jnp.maximum(vals[:, 0] + vals[:, 1] + vals[:, 2], _EPS)
    l1 = jnp.maximum(vals[:, 0], _EPS)
    return PcaFeatures(
        count=count,
        eigvals=vals,
        principal=vecs[..., 0],
        normal=vecs[..., 2],
        curvature=vals[:, 2] / s,
        linearity=(vals[:, 0] - vals[:, 1]) / l1,
        planarity=(vals[:, 1] - vals[:, 2]) / l1,
        sphericity=vals[:, 2] / l1,
        valid=q_mask & (count > min_k),
    )
