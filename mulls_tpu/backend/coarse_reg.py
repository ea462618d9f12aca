"""Robust global (coarse) registration from putative correspondences.

TPU-native replacements for the reference's two coarse-registration paths:

* :func:`coarse_reg_ransac` — the reference wraps PCL's sequential
  `CorrespondenceRejectorSampleConsensus` (`cregistration.hpp:605-661`);
  here ALL hypotheses are evaluated at once: M random 3-point minimal
  samples -> M closed-form rigid transforms (Kabsch on 3 points) -> M x K
  inlier matrix -> argmax, followed by a weighted-SVD refinement on the
  best consensus set.  This is embarrassingly parallel and MXU-friendly.
* :func:`coarse_reg_gnc` — certifiable-style robust registration in the
  spirit of TEASER++ (`coarse_reg_teaser`, `cregistration.hpp:664-759`):
  GNC-TLS over pairwise translation-invariant measurements (TIMs) for
  rotation, then component-wise median/TLS translation.  Deviation from
  TEASER++ (documented): no max-clique inlier pruning — the GNC loop plays
  that role; certificates are replaced by the same validity gate the
  reference uses (rotation-inlier count >= teaser_min_inlier_count).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mulls_tpu.core import se3


class CoarseRegResult(NamedTuple):
    transform: jnp.ndarray  # [4,4] source -> target
    inlier_count: jnp.ndarray
    valid: jnp.ndarray  # bool: enough inliers (>= min_inlier_count)
    reliable: jnp.ndarray  # bool: >= 2x min_inlier_count (reference gate)


def _kabsch(src, tgt, w):
    """Weighted rigid alignment: returns (R, t) minimizing |R s + t - q|^2_w.
    src/tgt: [..., N, 3], w: [..., N]."""
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    ws = w / wsum
    mu_s = jnp.einsum("...n,...ni->...i", ws, src)
    mu_t = jnp.einsum("...n,...ni->...i", ws, tgt)
    sc = src - mu_s[..., None, :]
    tc = tgt - mu_t[..., None, :]
    H = jnp.einsum("...n,...ni,...nj->...ij", ws, sc, tc)
    u, _, vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.swapaxes(vt, -1, -2) @ jnp.swapaxes(u, -1, -2))
    s = jnp.ones(H.shape[:-2] + (3,), H.dtype).at[..., 2].set(d)
    R = jnp.swapaxes(vt, -1, -2) @ (s[..., :, None]
                                    * jnp.swapaxes(u, -1, -2))
    t = mu_t - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


def _pack(R, t):
    T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return T


@partial(jax.jit, static_argnames=("num_hypotheses", "min_inlier_count"))
def coarse_reg_ransac(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
                      key: jax.Array, inlier_thre: float,
                      num_hypotheses: int = 512,
                      min_inlier_count: int = 8) -> CoarseRegResult:
    """src/tgt: [K, 3] putative correspondence pairs, mask: [K]."""
    k = src.shape[0]
    # sample 3 valid correspondences per hypothesis; duplicate picks give
    # a rank-deficient Kabsch, so such hypotheses are voted out below
    prob = mask.astype(jnp.float32)
    prob = prob / jnp.maximum(prob.sum(), 1.0)
    picks = jax.random.choice(key, k, (num_hypotheses, 3), replace=True,
                              p=prob)
    distinct = ((picks[:, 0] != picks[:, 1]) & (picks[:, 0] != picks[:, 2])
                & (picks[:, 1] != picks[:, 2]))
    s3 = src[picks]  # [M, 3, 3]
    t3 = tgt[picks]
    w3 = jnp.ones((num_hypotheses, 3), jnp.float32)
    R, t = _kabsch(s3, t3, w3)  # [M,3,3], [M,3]
    # inlier counts: [M, K]
    proj = jnp.einsum("mij,kj->mki", R, src) + t[:, None, :]
    d2 = jnp.sum((proj - tgt[None]) ** 2, -1)
    inl = (d2 <= inlier_thre ** 2) & mask[None, :]
    counts = jnp.where(distinct, jnp.sum(inl, axis=1), -1)
    best = jnp.argmax(counts)
    # refinement on the best consensus set
    w = inl[best].astype(jnp.float32)
    Rb, tb = _kabsch(src, tgt, w)
    proj = src @ Rb.T + tb
    inl_final = (jnp.sum((proj - tgt) ** 2, -1) <= inlier_thre ** 2) & mask
    n_inl = jnp.sum(inl_final)
    return CoarseRegResult(transform=_pack(Rb, tb), inlier_count=n_inl,
                           valid=n_inl >= min_inlier_count,
                           reliable=n_inl >= 2 * min_inlier_count)


@partial(jax.jit, static_argnames=("num_tims", "gnc_iters",
                                   "min_inlier_count"))
def coarse_reg_gnc(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
                   key: jax.Array, noise_bound: float,
                   num_tims: int = 2048, gnc_iters: int = 20,
                   min_inlier_count: int = 8) -> CoarseRegResult:
    """GNC-TLS robust registration (TEASER-style decoupling).

    Rotation from TIMs a_ij = s_i - s_j vs b_ij = q_i - q_j (translation
    cancels); GNC-TLS weight schedule with control parameter mu; rotation
    re-solved each iteration by weighted SVD.  Translation afterwards by
    component-wise median over rotation-inliers.
    """
    k = src.shape[0]
    k1, k2 = jax.random.split(key)
    prob = mask.astype(jnp.float32)
    prob = prob / jnp.maximum(prob.sum(), 1.0)
    i_idx = jax.random.choice(k1, k, (num_tims,), p=prob)
    j_idx = jax.random.choice(k2, k, (num_tims,), p=prob)
    ok = mask[i_idx] & mask[j_idx] & (i_idx != j_idx)
    a = src[i_idx] - src[j_idx]
    b = tgt[i_idx] - tgt[j_idx]
    # TIM noise bound is 2x the measurement bound
    nb2 = (2.0 * noise_bound) ** 2

    def residual2(R):
        e = jnp.einsum("ij,nj->ni", R, a) - b
        return jnp.sum(e * e, -1)

    # init: plain weighted Kabsch over all TIMs
    w0 = ok.astype(jnp.float32)
    R0, _ = _kabsch(a, b, w0)
    r2max = jnp.max(jnp.where(ok, residual2(R0), 0.0))
    mu0 = jnp.maximum(1.0 / (2.0 * r2max / nb2 - 1.0), 1e-6)

    def body(carry, _):
        R, mu = carry
        r2 = residual2(R)
        # GNC-TLS weights (Yang et al. 2020, eq. 14)
        lo = mu / (mu + 1.0) * nb2
        hi = (mu + 1.0) / mu * nb2
        w = jnp.where(r2 <= lo, 1.0,
                      jnp.where(r2 >= hi, 0.0,
                                jnp.sqrt(nb2 * mu * (mu + 1.0)
                                         / jnp.maximum(r2, 1e-12)) - mu))
        w = jnp.clip(w, 0.0, 1.0) * ok
        R_new, _ = _kabsch(a, b, w)
        return (R_new, mu * 1.4), None

    (R, _), _ = jax.lax.scan(body, (R0, mu0), None, length=gnc_iters)

    # rotation inliers among the original correspondences need translation:
    # estimate t as component-wise median of q - R s over all corrs, then
    # count inliers and polish with Kabsch on them
    diff = tgt - src @ R.T
    # nanmedian: plain median would propagate the NaNs of masked rows and
    # zero the translation estimate whenever any correspondence is invalid
    t_est = jnp.nanmedian(jnp.where(mask[:, None], diff, jnp.nan), axis=0)
    t_est = jnp.nan_to_num(t_est)
    d2 = jnp.sum((src @ R.T + t_est - tgt) ** 2, -1)
    inl = (d2 <= (2.0 * noise_bound) ** 2) & mask
    Rb, tb = _kabsch(src, tgt, inl.astype(jnp.float32))
    d2b = jnp.sum((src @ Rb.T + tb - tgt) ** 2, -1)
    inl_b = (d2b <= (2.0 * noise_bound) ** 2) & mask
    n_inl = jnp.sum(inl_b)
    return CoarseRegResult(transform=_pack(Rb, tb), inlier_count=n_inl,
                           valid=n_inl >= min_inlier_count,
                           reliable=n_inl >= 2 * min_inlier_count)


def double_check_tran(T_coarse: jnp.ndarray, T_predict: jnp.ndarray,
                      tran_thre: float, rot_thre_deg: float):
    """TEASER-vs-odometry consistency gate
    (`build_pose_graph.cpp:211-235`)."""
    dT = se3.inverse(T_predict) @ T_coarse
    dt = jnp.linalg.norm(dT[:3, 3])
    da = se3.rotation_angle(dT[:3, :3])
    return (dt <= tran_thre) & (da <= jnp.radians(rot_thre_deg))
