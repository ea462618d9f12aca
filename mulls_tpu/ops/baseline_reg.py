"""Baseline registration ops: NDT and voxelized GICP, TPU-native.

Device-kernel equivalents of the reference's vendored OpenMP baselines
(`include/baseline_reg/`: `ndt_omp.h:51-72` NDT with DIRECT1/DIRECT7
neighbor search, `fast_vgicp.h:19-25` voxelized GICP,
`voxel_grid_covariance_omp.h` per-voxel Gaussian grid), selected in the
reference by ``--baseline_reg_method=ndt|gicp``
(`mulls_slam.cpp:195-198,634-639`).

TPU re-design: the kd-tree / sparse voxel map becomes a hashed voxel
table built with scatter-adds (one pass over the target cloud); per-point
voxel lookup is a pure gather; each Gauss-Newton / Newton iteration is a
batched einsum producing one 6x6 system.  Everything is fixed-shape and
mask-weighted, so the whole registration jits into a single XLA program.

Hash collisions merge distinct voxels' statistics (the table is sized for
<2% collision at 20k occupied voxels); this perturbs the objective the
same way the reference's DIRECT1 approximation does and does not affect
convergence in practice.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mulls_tpu.core import se3
from mulls_tpu.ops.voxel import hash_ijk as _hash_ijk


class VoxelTable(NamedTuple):
    """Per-slot Gaussian statistics of a point cloud on a voxel grid."""
    count: jnp.ndarray      # [T]
    mean: jnp.ndarray       # [T, 3]
    inv_cov: jnp.ndarray    # [T, 3, 3] regularized inverse covariance
    cov: jnp.ndarray        # [T, 3, 3]
    resolution: jnp.ndarray


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack([
        e * i - f * h, c * h - b * i, b * f - c * e,
        f * g - d * i, a * i - c * g, c * d - a * f,
        d * h - e * g, b * g - a * h, a * e - b * d,
    ], axis=-1).reshape(A.shape)
    det = a * co[..., 0, 0] + b * co[..., 1, 0] + c * co[..., 2, 0]
    return co / jnp.maximum(jnp.abs(det), 1e-12)[..., None, None] \
        * jnp.sign(det)[..., None, None]


@partial(jax.jit, static_argnames=("table_size", "min_points", "mode"))
def build_voxel_table(xyz: jnp.ndarray, mask: jnp.ndarray,
                      resolution: float, table_size: int = 1 << 17,
                      min_points: int = 6, mode: str = "ndt") -> VoxelTable:
    """One scatter pass -> per-voxel (count, mean, covariance, inverse).

    ``mode='ndt'``: covariance eigenvalues floored at 1e-2 of the largest
    (`voxel_grid_covariance_omp` regularization). ``mode='gicp'``:
    plane-regularized covariance C <- R diag(1,1,eps) R^T (fast_vgicp).
    """
    w = mask.astype(jnp.float32)
    slot = _hash_ijk(jnp.floor(xyz / resolution).astype(jnp.int32),
                     table_size)
    count = jnp.zeros((table_size,), jnp.float32).at[slot].add(w)
    s1 = jnp.zeros((table_size, 3), jnp.float32).at[slot].add(
        w[:, None] * xyz)
    outer = xyz[:, :, None] * xyz[:, None, :]
    s2 = jnp.zeros((table_size, 3, 3), jnp.float32).at[slot].add(
        w[:, None, None] * outer)
    n = jnp.maximum(count, 1.0)
    mean = s1 / n[:, None]
    cov = s2 / n[:, None, None] - mean[:, :, None] * mean[:, None, :]

    # regularize via closed-form symmetric 3x3 eigendecomposition
    from mulls_tpu.ops.pca import eigh_sym3x3
    lam, V = eigh_sym3x3(cov)  # descending
    lam0 = jnp.maximum(lam[:, :1], 1e-6)
    if mode == "gicp":
        lam_r = jnp.concatenate([jnp.ones_like(lam[:, :2]),
                                 jnp.full_like(lam[:, 2:], 1e-3)], axis=-1)
    else:
        # NDT: floor eigenvalues at 1e-2 of the largest, PRESERVING the
        # absolute scale (`voxel_grid_covariance_omp` semantics) — dividing
        # by lam0 would make every voxel's spread identical
        lam_r = jnp.maximum(lam, 1e-2 * lam0)
    cov_r = jnp.einsum("tik,tk,tjk->tij", V, lam_r, V)
    inv = _inv3x3(cov_r + 1e-6 * jnp.eye(3))
    valid = count >= min_points
    inv = jnp.where(valid[:, None, None], inv, 0.0)
    # under-populated voxels are unusable: zero the count so every
    # consumer's `count > 0` validity gate excludes them
    count = jnp.where(valid, count, 0.0)
    return VoxelTable(count=count, mean=mean, inv_cov=inv, cov=cov_r,
                      resolution=jnp.float32(resolution))


class BaselineResult(NamedTuple):
    transform: jnp.ndarray  # [4,4]
    fitness: jnp.ndarray    # mean per-point score / residual
    matched: jnp.ndarray    # number of points in valid voxels (last iter)
    iterations: jnp.ndarray


_NEIGHBOR_OFFSETS = jnp.asarray(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
     [0, 0, 1], [0, 0, -1]], jnp.int32)


def _gn_iteration(p_t: jnp.ndarray, s_mask: jnp.ndarray, table: VoxelTable,
                  table_size: int, offsets: jnp.ndarray,
                  point_weight: jnp.ndarray):
    """One Gauss-Newton accumulation against the voxel Gaussians.
    Returns (H [6,6], g [6], score, matched)."""
    ijk0 = jnp.floor(p_t / table.resolution).astype(jnp.int32)
    H = jnp.zeros((6, 6), jnp.float32)
    g = jnp.zeros((6,), jnp.float32)
    score = jnp.float32(0.0)
    matched = jnp.float32(0.0)
    for k in range(offsets.shape[0]):
        slot = _hash_ijk(ijk0 + offsets[k], table_size)
        mu = table.mean[slot]
        icov = table.inv_cov[slot]
        d = p_t - mu                                  # [N,3]
        valid = s_mask & (table.count[slot] > 0) \
            & (jnp.abs(icov).sum((-1, -2)) > 0)
        icd = jnp.einsum("nij,nj->ni", icov, d)       # [N,3]
        md = jnp.sum(d * icd, -1)
        # Gaussian score weight (IRLS): suppresses the pull of far
        # neighbor-voxel Gaussians — without it DIRECT7 is biased toward
        # neighbor centroids (Magnusson's d1/d2 mixture plays this role in
        # `ndt_omp_impl.hpp`)
        wg = jnp.exp(-0.5 * jnp.clip(md, 0.0, 50.0))
        w = valid.astype(jnp.float32) * point_weight * wg
        # J = d r / d x with r = p_t - mu, x = (t, omega) small-angle:
        # dr/dt = I, dr/domega = -skew(p_t)
        sk = jax.vmap(se3.skew)(p_t)                  # [N,3,3]
        J = jnp.concatenate([jnp.broadcast_to(jnp.eye(3), sk.shape[:1]
                                              + (3, 3)), -sk], axis=-1)
        H = H + jnp.einsum("n,nij,nik,nkl->jl", w, J, icov, J)
        g = g + jnp.einsum("n,nij,ni->j", w, J, icd)
        score = score + jnp.sum(w * md)
        matched = matched + jnp.sum(valid)
    return H, g, score, matched


def _ndt_score(p_t: jnp.ndarray, s_mask: jnp.ndarray, table: VoxelTable,
               table_size: int, offsets: jnp.ndarray):
    """Score-only pass (negative Gaussian mixture likelihood proxy): lower
    is better.  Used by the step-size control — the reference's
    More-Thuente line search (`ndt_omp_impl.hpp`) guards exactly this
    objective against over-stepping at coarse voxel sizes."""
    score = jnp.float32(0.0)
    matched = jnp.float32(0.0)
    ijk0 = jnp.floor(p_t / table.resolution).astype(jnp.int32)
    for k in range(offsets.shape[0]):
        slot = _hash_ijk(ijk0 + offsets[k], table_size)
        d = p_t - table.mean[slot]
        icov = table.inv_cov[slot]
        valid = s_mask & (table.count[slot] > 0) \
            & (jnp.abs(icov).sum((-1, -2)) > 0)
        md = jnp.einsum("ni,nij,nj->n", d, icov, d)
        # negative Gaussian: bounded, so outliers cannot dominate
        score = score - jnp.sum(valid * jnp.exp(-0.5 * jnp.clip(md, 0.0,
                                                                50.0)))
        matched = matched + jnp.sum(valid)
    return score, matched


@partial(jax.jit, static_argnames=("max_iter", "table_size", "direct7",
                                   "step_control"))
def ndt_register(s_xyz: jnp.ndarray, s_mask: jnp.ndarray, table: VoxelTable,
                 init_guess: jnp.ndarray, max_iter: int = 30,
                 table_size: int = 1 << 17,
                 direct7: bool = True,
                 step_control: bool = True) -> BaselineResult:
    """NDT: Newton iterations on the sum of per-voxel Mahalanobis scores
    (`ndt_omp_impl.hpp` simplified to the quadratic model — the Gaussian
    reweighting of Magnusson's d1/d2 mixture adds nothing measurable at
    LiDAR odometry noise levels and the quadratic keeps H PSD).

    ``step_control`` is the batched stand-in for More-Thuente: each
    iteration evaluates the mixture score at step fractions {1, 1/2, 1/4}
    plus zero and takes the best — a step that would regress the score is
    halved or rejected, which is what keeps 1-2 m voxel runs from
    oscillating across voxel boundaries."""
    offs = _NEIGHBOR_OFFSETS if direct7 else _NEIGHBOR_OFFSETS[:1]
    ones = jnp.ones_like(s_mask, jnp.float32)

    def body(state):
        it, T, _, _, delta_norm = state
        p_t = se3.transform_points(T, s_xyz)
        H, g, score, matched = _gn_iteration(
            p_t, s_mask, table, table_size, offs, ones)
        H = H + 1e-3 * jnp.eye(6)
        delta = jnp.linalg.solve(H, -g)
        if step_control:
            # halving-only: the Gaussian-mixture score is flat far from
            # alignment, so a zero-step candidate could stall a cold start
            # the Newton direction would have fixed — always move, halve
            # when the full step regresses the score
            cands = [jnp.float32(1.0), jnp.float32(0.5), jnp.float32(0.25)]
            scores = []
            for a in cands:
                p_a = se3.transform_points(se3.se3_boxplus(T, a * delta),
                                           s_xyz)
                scores.append(_ndt_score(p_a, s_mask, table, table_size,
                                         offs)[0])
            alphas = jnp.stack(cands)
            alpha = alphas[jnp.argmin(jnp.stack(scores))]
            T_new = se3.se3_boxplus(T, alpha * delta)
            dn = jnp.linalg.norm(delta) * alpha
        else:
            T_new = se3.se3_boxplus(T, delta)
            dn = jnp.linalg.norm(delta)
        return (it + 1, T_new, score / jnp.maximum(matched, 1.0), matched,
                dn)

    def cond(state):
        it, _, _, _, dn = state
        return (it < max_iter) & ((it < 2) | (dn > 1e-4))

    it, T, fit, matched, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_guess.astype(jnp.float32),
                     jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0)))
    T = T.at[:3, :3].set(se3.orthonormalize(T[:3, :3]))
    return BaselineResult(transform=T, fitness=fit, matched=matched,
                          iterations=it)


@partial(jax.jit, static_argnames=("max_iter", "table_size"))
def vgicp_register(s_xyz: jnp.ndarray, s_mask: jnp.ndarray,
                   s_cov: jnp.ndarray, table: VoxelTable,
                   init_guess: jnp.ndarray, max_iter: int = 30,
                   table_size: int = 1 << 17) -> BaselineResult:
    """Voxelized GICP (`fast_vgicp_impl.hpp` behavior): distribution-to-
    distribution residual r = mu_b - T p_a with weight
    M = (C_b + R C_a R^T)^-1, Gauss-Newton on SE(3)."""

    def body(state):
        it, T, _, _, delta_norm = state
        R = T[:3, :3]
        p_t = se3.transform_points(T, s_xyz)
        slot = _hash_ijk(jnp.floor(p_t / table.resolution).astype(jnp.int32),
                         table_size)
        mu = table.mean[slot]
        Cb = table.cov[slot]
        valid = s_mask & (table.count[slot] > 0)
        w = valid.astype(jnp.float32)
        Ca_rot = jnp.einsum("ij,njk,lk->nil", R, s_cov, R)
        M = _inv3x3(Cb + Ca_rot + 1e-6 * jnp.eye(3))
        d = p_t - mu
        # robust (Geman-McClure-style) reweighting: hash-collision voxels
        # and boundary mismatches otherwise pull with unbounded leverage
        md_w = jnp.einsum("ni,nij,nj->n", d, M, d)
        w = w * 9.0 / (9.0 + md_w)
        sk = jax.vmap(se3.skew)(p_t)
        J = jnp.concatenate([jnp.broadcast_to(jnp.eye(3), sk.shape[:1]
                                              + (3, 3)), -sk], axis=-1)
        H = jnp.einsum("n,nij,nik,nkl->jl", w, J, M, J) + 1e-3 * jnp.eye(6)
        Md = jnp.einsum("nij,nj->ni", M, d)
        g = jnp.einsum("n,nij,ni->j", w, J, Md)
        delta = jnp.linalg.solve(H, -g)
        T_new = se3.se3_boxplus(T, delta)
        fit = jnp.sum(w * jnp.sum(d * Md, -1)) / jnp.maximum(jnp.sum(w), 1.0)
        return (it + 1, T_new, fit, jnp.sum(w), jnp.linalg.norm(delta))

    def cond(state):
        it, _, _, _, dn = state
        return (it < max_iter) & ((it < 2) | (dn > 1e-4))

    it, T, fit, matched, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_guess.astype(jnp.float32),
                     jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0)))
    T = T.at[:3, :3].set(se3.orthonormalize(T[:3, :3]))
    return BaselineResult(transform=T, fitness=fit, matched=matched,
                          iterations=it)


def point_covariances(xyz: jnp.ndarray, mask: jnp.ndarray, radius: float
                      ) -> jnp.ndarray:
    """Per-point neighborhood covariances for the GICP source side,
    plane-regularized like fast_vgicp (eigenvalues -> (1, 1, 1e-3))."""
    from mulls_tpu.ops import neighbors as nbr
    from mulls_tpu.ops.pca import eigh_sym3x3
    m = nbr.radius_moments(xyz, mask, xyz, mask, radius)
    cov = nbr.cov_from_moments(m["count"], m["sum_xyz"], m["sum_outer"])
    lam, V = eigh_sym3x3(cov)  # descending
    lam_r = jnp.concatenate([jnp.ones_like(lam[:, :2]),
                             jnp.full_like(lam[:, 2:], 1e-3)], axis=-1)
    return jnp.einsum("nik,nk,njk->nij", V, lam_r, V)
