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
  a pairwise-consistency pruning stage (the role of TEASER's max-clique,
  as a batched greedy clique growth + geometric verification, pure MXU
  matmuls), then GNC-TLS over pairwise translation-invariant measurements
  (TIMs) for rotation and component-wise median/TLS translation.
  Certificates are replaced by the same validity gate the reference uses
  (rotation-inlier count >= teaser_min_inlier_count).
* :func:`coarse_reg_bev` — global (yaw, tx, ty) BEV raster correlation:
  a full-basin search for the planar/vehicle case that survives putative
  match sets no robust estimator can (see its docstring).
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


@partial(jax.jit, static_argnames=("grow_steps", "num_seeds"))
def clique_consistency_mask(src: jnp.ndarray, tgt: jnp.ndarray,
                            mask: jnp.ndarray, eps: float,
                            grow_steps: int = 40, num_seeds: int = 0):
    """Prune putative correspondences by rigid pairwise consistency.

    Correspondences i, j are compatible when ``| |s_i-s_j| - |q_i-q_j| |``
    is below ``eps`` — the distance-preservation graph TEASER++'s
    max-clique stage runs on (`cregistration.hpp:699-727`).  True inliers
    form an (exact) clique; self-similar scenes produce large *soft*
    clusters that defeat spectral/eigenvector relaxations, so this is a
    parallel greedy clique growth: every correspondence seeds a clique,
    each step adds the candidate with the most edges into the remaining
    candidate set — one ``[S,K] @ [K,K]`` masked matmul per step, batched
    over all seeds on the MXU.  Returns (members of the largest grown
    clique, clique size).  NCC putative matches run >90% outliers at
    loop-closure baselines; GNC alone cannot recover from that, this can.
    """
    k = src.shape[0]
    ds = jnp.linalg.norm(src[:, None, :] - src[None, :, :], axis=-1)
    dt = jnp.linalg.norm(tgt[:, None, :] - tgt[None, :, :], axis=-1)
    compat = (jnp.abs(ds - dt) < eps) & mask[:, None] & mask[None, :]
    # duplicate matches (same keypoint on either side) trivially satisfy
    # the consistency test — never let them certify each other
    compat = compat & (ds > 0.1) & (dt > 0.1)
    compat = compat & ~jnp.eye(k, dtype=bool)
    A = compat.astype(jnp.float32)

    s = num_seeds or k
    # seed with the s highest-degree vertices (all of them by default)
    deg = jnp.sum(A, axis=1)
    _, seeds = jax.lax.top_k(deg, s)
    members = jax.nn.one_hot(seeds, k, dtype=jnp.float32)  # [S,K]
    cand = compat[seeds] & mask[None, :]  # [S,K]

    def step(carry, _):
        members, cand = carry
        # degree of each candidate within its seed's candidate set
        # +0.5 keeps zero-degree candidates pickable (a lone final member
        # would otherwise give an all-zero score row whose argmax falls
        # back to index 0 — an arbitrary, unvetted correspondence)
        score = (cand.astype(jnp.float32) @ A + 0.5) * cand  # [S,K]
        best = jnp.argmax(score, axis=1)  # [S]
        picked = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        any_cand = jnp.any(cand, axis=1) & picked
        add = jax.nn.one_hot(best, k, dtype=jnp.float32) \
            * any_cand[:, None].astype(jnp.float32)
        members = jnp.minimum(members + add, 1.0)
        # remaining candidates must be compatible with the new member too
        cand = cand & (compat[best] | ~any_cand[:, None]) \
            & (members < 0.5)
        return (members, cand), None

    (members, _), _ = jax.lax.scan(step, (members, cand), None,
                                   length=grow_steps)
    # geometric verification of every grown clique: batched Kabsch on the
    # members, then inlier support over ALL matches.  Self-similar scenes
    # (street symmetry) grow spurious cliques of comparable size — support
    # over the full putative set disambiguates where size cannot.  A
    # couple of median-scaled trim iterations first: a single outlier that
    # slipped into a clique otherwise poisons the unweighted fit
    src_b = jnp.broadcast_to(src, members.shape + (3,))
    tgt_b = jnp.broadcast_to(tgt, members.shape + (3,))

    def trim(w, _):
        R, t = _kabsch(src_b, tgt_b, w)
        proj = jnp.einsum("sij,kj->ski", R, src) + t[:, None, :]
        d2 = jnp.sum((proj - tgt[None]) ** 2, -1)
        med = jnp.nanmedian(jnp.where(members > 0.5, d2, jnp.nan),
                            axis=1, keepdims=True)
        med = jnp.nan_to_num(med, nan=1.0)
        return members * (d2 <= 9.0 * med), None

    w, _ = jax.lax.scan(trim, members, None, length=3)
    R, t = _kabsch(src_b, tgt_b, w)
    proj = jnp.einsum("sij,kj->ski", R, src) + t[:, None, :]
    d2 = jnp.sum((proj - tgt[None]) ** 2, -1)
    support = (d2 <= eps * eps) & mask[None, :]
    counts = jnp.sum(support, axis=1)
    best_seed = jnp.argmax(counts)
    keep = support[best_seed] & mask
    return keep, jnp.sum(keep)


@partial(jax.jit, static_argnames=("num_hypotheses", "min_inlier_count"))
def coarse_reg_ransac(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
                      key: jax.Array, inlier_thre: float,
                      num_hypotheses: int = 512,
                      min_inlier_count: int = 8) -> CoarseRegResult:
    """src/tgt: [K, 3] putative correspondence pairs, mask: [K]."""
    k = src.shape[0]
    # consistency pruning first: at >90% outlier rates an all-inlier
    # 3-sample is otherwise vanishingly rare
    keep, _ = clique_consistency_mask(src, tgt, mask, eps=inlier_thre)
    mask = jnp.where(jnp.sum(keep) >= min_inlier_count, keep, mask)
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
    # max-clique-style consistency pruning (spectral relaxation); fall
    # back to the raw set when the dominant cluster is too small
    keep, _ = clique_consistency_mask(src, tgt, mask, eps=noise_bound)
    sel = jnp.sum(keep) >= min_inlier_count
    mask_gnc = jnp.where(sel, keep, mask)
    prob = mask_gnc.astype(jnp.float32)
    prob = prob / jnp.maximum(prob.sum(), 1.0)
    i_idx = jax.random.choice(k1, k, (num_tims,), p=prob)
    j_idx = jax.random.choice(k2, k, (num_tims,), p=prob)
    ok = mask_gnc[i_idx] & mask_gnc[j_idx] & (i_idx != j_idx)
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
    t_est = jnp.nanmedian(jnp.where(mask_gnc[:, None], diff, jnp.nan), axis=0)
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


@partial(jax.jit, static_argnames=("grid", "res", "yaw_steps", "chunk"))
def coarse_reg_bev(src: jnp.ndarray, src_mask: jnp.ndarray,
                   tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                   grid: int = 256, res: float = 0.5,
                   yaw_steps: int = 120, chunk: int = 24,
                   min_peak_ratio: float = 0.25):
    """Global 3-DoF (yaw, tx, ty) registration by BEV raster correlation.

    A global-basin coarse initializer for the vehicle / loop-closure case
    where descriptor matching degrades (NCC putative sets at wide
    baselines run >95% outliers and can prefer a coherent wrong mode —
    no robust estimator survives that).  Both clouds are rasterized to a
    2D occupancy grid; every yaw hypothesis is scored by a dense 2D
    cross-correlation over ALL translations at once via FFT — the search
    cannot miss the true basin, unlike local ICP or sampled hypotheses.
    Pure FFT/elementwise work, TPU-idiomatic.  Capability superset of the
    reference's TEASER loop-closure initializer for planar motion; full
    6-DoF cases keep :func:`coarse_reg_gnc`.

    src/tgt: [N,3]/[M,3] feature points (facade/pillar/beam work best).
    Returns CoarseRegResult; inlier_count is the number of overlapping
    occupied cells at the peak, valid gates on peak/self-correlation.
    """
    half = grid // 2

    def raster(xyz, mask):
        ij = jnp.floor(xyz[:, :2] / res).astype(jnp.int32) + half
        ok = mask & jnp.all((ij >= 0) & (ij < grid), axis=1)
        ij = jnp.clip(ij, 0, grid - 1)
        img = jnp.zeros((grid, grid), jnp.float32)
        img = img.at[ij[:, 0], ij[:, 1]].add(jnp.where(ok, 1.0, 0.0))
        return jnp.minimum(img, 3.0)

    tgt_img = raster(tgt, tgt_mask)
    # zero-padded FFT correlation (linear, not circular)
    pad = 2 * grid
    tgt_f = jnp.fft.rfft2(tgt_img, (pad, pad))

    # pad the yaw sweep to a multiple of the chunk size (repeated final
    # hypotheses are harmless — same score, argmax picks the first)
    n_pad = -yaw_steps % chunk
    yaws = jnp.arange(yaw_steps + n_pad, dtype=jnp.float32) \
        * (2.0 * jnp.pi / yaw_steps)
    yaws = jnp.minimum(yaws, 2.0 * jnp.pi * (yaw_steps - 1) / yaw_steps)

    def score_yaw(yaw_chunk):
        c, s = jnp.cos(yaw_chunk), jnp.sin(yaw_chunk)
        # rotate source xy by yaw: [C,N,2]
        x, y = src[:, 0], src[:, 1]
        xr = c[:, None] * x[None] - s[:, None] * y[None]
        yr = s[:, None] * x[None] + c[:, None] * y[None]
        ij = jnp.floor(jnp.stack([xr, yr], -1) / res).astype(jnp.int32) + half
        ok = src_mask[None] & jnp.all((ij >= 0) & (ij < grid), axis=-1)
        ij = jnp.clip(ij, 0, grid - 1)
        imgs = jnp.zeros((yaw_chunk.shape[0], grid, grid), jnp.float32)
        bidx = jnp.broadcast_to(jnp.arange(yaw_chunk.shape[0])[:, None],
                                ok.shape)
        imgs = imgs.at[bidx, ij[..., 0], ij[..., 1]].add(
            jnp.where(ok, 1.0, 0.0))
        imgs = jnp.minimum(imgs, 3.0)
        src_f = jnp.fft.rfft2(imgs, (pad, pad))
        corr = jnp.fft.irfft2(jnp.conj(src_f) * tgt_f[None], (pad, pad))
        best = jnp.max(corr.reshape(yaw_chunk.shape[0], -1), axis=1)
        arg = jnp.argmax(corr.reshape(yaw_chunk.shape[0], -1), axis=1)
        return best, arg

    best, arg = jax.lax.map(score_yaw, yaws.reshape(-1, chunk))
    best = best.reshape(-1)
    arg = arg.reshape(-1)
    k = jnp.argmax(best)
    yaw = yaws[k]
    di = arg[k] // pad
    dj = arg[k] % pad
    # FFT correlation index -> shift (wrap negative shifts)
    di = jnp.where(di > pad // 2, di - pad, di)
    dj = jnp.where(dj > pad // 2, dj - pad, dj)
    t_xy = jnp.stack([di, dj]).astype(jnp.float32) * res
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R = R.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    t = jnp.array([t_xy[0], t_xy[1], 0.0])
    # z offset: medians of the height distributions (vehicle scans share
    # the ground plane; ICP refines the rest)
    src_z = jnp.nanmedian(jnp.where(src_mask, src[:, 2], jnp.nan))
    tgt_z = jnp.nanmedian(jnp.where(tgt_mask, tgt[:, 2], jnp.nan))
    t = t.at[2].set(jnp.nan_to_num(tgt_z - src_z))
    # validity: peak against the GEOMETRIC MEAN of both self-correlations
    # (Cauchy-Schwarz bound); normalizing by the target alone would make a
    # sparse source unvalidatable even at perfect alignment
    self_t = jnp.sum(tgt_img * tgt_img)
    self_s = jnp.sum(raster(src, src_mask) ** 2)
    norm = jnp.sqrt(jnp.maximum(self_t * self_s, 1e-12))
    peak = best[k]
    n_cells = peak / 9.0  # upper bound estimate of overlapping full cells
    return CoarseRegResult(
        transform=_pack(R, t),
        inlier_count=n_cells.astype(jnp.int32),
        valid=peak > min_peak_ratio * norm,
        reliable=peak > 2.0 * min_peak_ratio * norm)


def bev_feature_stack(clouds: dict, names=("facade", "pillar", "beam",
                                           "vertex")):
    """Concatenate the BEV-relevant feature classes of a FeatureCloud dict
    (frame ``down`` clouds or submap clouds) into (xyz, mask) for
    :func:`coarse_reg_bev` — shared by the reg CLI and the loop-closure
    fallback so the class choice cannot drift between them."""
    xyz = jnp.concatenate([clouds[n].xyz for n in names])
    mask = jnp.concatenate([clouds[n].mask for n in names])
    return xyz, mask
