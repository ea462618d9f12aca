"""FPFH descriptors + SAC-IA coarse registration — parity with the
reference's alternative coarse-registration path
(`cregistration.hpp:351-408`: ``compute_fpfh_feature`` wrapping PCL's
``FPFHEstimationOMP`` and ``coarse_reg_fpfhsac`` wrapping
``SampleConsensusInitialAlignment``).

TPU re-design: the kd-tree radius searches and per-point histogram loops
become one brute-force pairwise pass — an [N, N] distance/feature matrix
(MXU-sized: coarse registration runs on keypoint/downsampled clouds of a
few thousand points), one-hot histogram reductions, and the FPFH
neighbor-weighting step as a single [N, N] @ [N, 33] matmul.  SAC-IA's
sequential sample-and-test loop becomes descriptor matching (with PCL's
``CorrespondenceRandomness``-style top-k randomization) feeding the
vectorized hypothesis sweep of :func:`coarse_reg_ransac`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mulls_tpu.backend.coarse_reg import CoarseRegResult, _kabsch, _pack

N_BINS = 11  # PCL FPFHSignature33: 11 bins x 3 angular features


def _soft_histogram(bins: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """bins [N, N] int in [0, N_BINS), weights [N, N] -> [N, N_BINS]
    per-row weighted counts.  Accumulates bin by bin so only [N, N]
    transients exist (a one-hot [N, N, 11] tensor would be ~0.7 GB at
    N=4096)."""
    return jnp.stack(
        [jnp.sum(jnp.where(bins == b, weights, 0.0), axis=1)
         for b in range(N_BINS)], axis=-1)


@partial(jax.jit, static_argnames=())
def compute_fpfh(xyz: jnp.ndarray, normals: jnp.ndarray, mask: jnp.ndarray,
                 radius: float) -> jnp.ndarray:
    """[N,3] points + unit normals + validity mask -> [N, 33] FPFH.

    Matches PCL's estimator semantics (`cregistration.hpp:360-369`,
    radius = 2 x the caller's search radius is applied by the caller):
    SPFH Darboux-frame angle histograms (f1 = v.n_q, f2 = |d|-normalized
    u.d, f3 = atan2(w.n_q, u.n_q)) followed by distance-weighted neighbor
    averaging, each 11-bin block normalized to percentages.
    """
    n = xyz.shape[0]
    d = xyz[None, :, :] - xyz[:, None, :]  # p -> q
    dist = jnp.linalg.norm(d, axis=-1)
    nbr = (dist <= radius) & (dist > 1e-9) & mask[None, :] & mask[:, None]

    dn = d / jnp.maximum(dist, 1e-9)[..., None]
    # Darboux frame at the source point of each pair (PCL computePairFeatures
    # picks the point with the smaller angle to d as source; the symmetric
    # average below makes that choice immaterial for the histogram shape)
    u = jnp.broadcast_to(normals[:, None, :], d.shape)  # n_p
    nq = jnp.broadcast_to(normals[None, :, :], d.shape)  # n_q
    v = jnp.cross(dn, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    f1 = jnp.sum(v * nq, -1)                      # alpha in [-1, 1]
    f2 = jnp.sum(u * dn, -1)                      # phi   in [-1, 1]
    f3 = jnp.arctan2(jnp.sum(w * nq, -1), jnp.sum(u * nq, -1))  # [-pi, pi]

    wgt = nbr.astype(jnp.float32)
    b1 = jnp.clip(((f1 + 1.0) * 0.5 * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
    b2 = jnp.clip(((f2 + 1.0) * 0.5 * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
    b3 = jnp.clip(((f3 / jnp.pi + 1.0) * 0.5 * N_BINS).astype(jnp.int32),
                  0, N_BINS - 1)
    spfh = jnp.concatenate([_soft_histogram(b1, wgt),
                            _soft_histogram(b2, wgt),
                            _soft_histogram(b3, wgt)], -1)  # [N, 33]
    # normalize each point's SPFH blocks by its neighbor count
    k = jnp.maximum(jnp.sum(wgt, -1, keepdims=True), 1.0)
    spfh = spfh / k

    # FPFH(p) = SPFH(p) + 1/k sum_q (1/omega_q) SPFH(q), omega = pair dist
    inv_w = wgt / jnp.maximum(dist, 1e-3)
    fpfh = spfh + (inv_w @ spfh) / k
    # percentage normalization per 11-bin block (PCL convention)
    blocks = fpfh.reshape(n, 3, N_BINS)
    blocks = 100.0 * blocks / jnp.maximum(
        jnp.sum(blocks, -1, keepdims=True), 1e-9)
    return jnp.where(mask[:, None], blocks.reshape(n, 3 * N_BINS), 0.0)


class FpfhMatches(NamedTuple):
    src_idx: jnp.ndarray  # [K] indices into the source cloud
    tgt_idx: jnp.ndarray  # [K] matched target indices
    mask: jnp.ndarray     # [K] validity


@partial(jax.jit, static_argnames=("randomness",))
def match_fpfh(fpfh_src: jnp.ndarray, mask_src: jnp.ndarray,
               fpfh_tgt: jnp.ndarray, mask_tgt: jnp.ndarray,
               key: jax.Array, randomness: int = 15) -> FpfhMatches:
    """Descriptor matching with SAC-IA's correspondence randomization
    (`cregistration.hpp:393` ``setCorrespondenceRandomness(15)``): each
    source descriptor draws uniformly among its ``randomness`` nearest
    target descriptors (L2)."""
    d2 = (jnp.sum(fpfh_src**2, -1)[:, None]
          - 2.0 * fpfh_src @ fpfh_tgt.T
          + jnp.sum(fpfh_tgt**2, -1)[None, :])
    d2 = jnp.where(mask_tgt[None, :], d2, jnp.inf)
    _, topk = jax.lax.top_k(-d2, randomness)  # [Ns, randomness]
    pick = jax.random.randint(key, (fpfh_src.shape[0],), 0, randomness)
    tgt_idx = jnp.take_along_axis(topk, pick[:, None], 1)[:, 0]
    ok = mask_src & mask_tgt[tgt_idx]
    return FpfhMatches(src_idx=jnp.arange(fpfh_src.shape[0]),
                       tgt_idx=tgt_idx, mask=ok)


def _nn_d2(pts: jnp.ndarray, tgt: jnp.ndarray, tgt_mask: jnp.ndarray
           ) -> jnp.ndarray:
    """[..., S, 3] query vs [Nt, 3] target -> [..., S] squared 1-NN dist."""
    d2 = (jnp.sum(pts**2, -1)[..., :, None]
          - 2.0 * pts @ tgt.T + jnp.sum(tgt**2, -1))
    return jnp.min(jnp.where(tgt_mask, d2, jnp.inf), -1)


@partial(jax.jit, static_argnames=("num_hypotheses", "num_score_pts",
                                   "randomness", "min_inlier_count"))
def _sac_ia(src_xyz, src_mask, tgt_xyz, tgt_mask, topk_tgt, key,
            inlier_thre, num_hypotheses, num_score_pts, randomness,
            min_inlier_count):
    k1, k2, k3 = jax.random.split(key, 3)
    ns = src_xyz.shape[0]
    prob = src_mask.astype(jnp.float32)
    prob = prob / jnp.maximum(prob.sum(), 1.0)
    s_idx = jax.random.choice(k1, ns, (num_hypotheses, 3), p=prob)
    pick = jax.random.randint(k2, (num_hypotheses, 3), 0, randomness)
    t_idx = topk_tgt[s_idx, pick]  # [M, 3]
    R, t = _kabsch(src_xyz[s_idx], tgt_xyz[t_idx],
                   jnp.ones((num_hypotheses, 3), jnp.float32))

    # score each hypothesis by truncated 1-NN error over a fixed scoring
    # subset (PCL's align() loop with a truncated/Huber error functor)
    score_idx = jax.random.choice(k3, ns, (num_score_pts,), p=prob)
    spts = src_xyz[score_idx]
    thre2 = inlier_thre * inlier_thre

    def score_chunk(Rt):
        Rc, tc = Rt
        proj = jnp.einsum("mij,sj->msi", Rc, spts) + tc[:, None, :]
        nn = _nn_d2(proj, tgt_xyz, tgt_mask)
        return jnp.sum(jnp.minimum(nn, thre2), -1)

    chunk = 64  # hypotheses are padded up so any count works
    n_pad = -num_hypotheses % chunk
    Rp = jnp.concatenate([R, jnp.broadcast_to(jnp.eye(3), (n_pad, 3, 3))])
    tp = jnp.concatenate([t, jnp.full((n_pad, 3), 1e6, t.dtype)])
    scores = jax.lax.map(
        score_chunk, (Rp.reshape(-1, chunk, 3, 3), tp.reshape(-1, chunk, 3))
    ).reshape(num_hypotheses + n_pad)[:num_hypotheses]
    best = jnp.argmin(scores)
    Rb, tb = R[best], t[best]

    # polish: a few dense 1-NN Kabsch iterations on trimmed correspondences
    def polish(carry, _):
        Rc, tc = carry
        proj = src_xyz @ Rc.T + tc
        d2 = (jnp.sum(proj**2, -1)[:, None] - 2.0 * proj @ tgt_xyz.T
              + jnp.sum(tgt_xyz**2, -1))
        d2 = jnp.where(tgt_mask, d2, jnp.inf)
        j = jnp.argmin(d2, -1)
        w = (jnp.min(d2, -1) <= thre2) & src_mask
        Rn, tn = _kabsch(src_xyz, tgt_xyz[j], w.astype(jnp.float32))
        return (Rn, tn), None

    (Rb, tb), _ = jax.lax.scan(polish, (Rb, tb), None, length=3)
    nn = _nn_d2(src_xyz @ Rb.T + tb, tgt_xyz, tgt_mask)
    inl = (nn <= thre2) & src_mask
    n_inl = jnp.sum(inl)
    fitness = (jnp.sum(jnp.where(src_mask, nn, 0.0))
               / jnp.maximum(jnp.sum(src_mask), 1))
    res = CoarseRegResult(transform=_pack(Rb, tb), inlier_count=n_inl,
                          valid=n_inl >= min_inlier_count,
                          reliable=n_inl >= 2 * min_inlier_count)
    return res, fitness


def coarse_reg_fpfhsac(src_xyz: jnp.ndarray, src_normals: jnp.ndarray,
                       src_mask: jnp.ndarray,
                       tgt_xyz: jnp.ndarray, tgt_normals: jnp.ndarray,
                       tgt_mask: jnp.ndarray,
                       key: jax.Array, search_radius: float,
                       inlier_thre: float = 1.0,
                       num_hypotheses: int = 512,
                       num_score_pts: int = 256,
                       randomness: int = 15,
                       min_inlier_count: int = 8
                       ) -> Tuple[CoarseRegResult, jnp.ndarray]:
    """FPFH-SAC initial alignment (`coarse_reg_fpfhsac`,
    `cregistration.hpp:372-407`) — SAC-IA semantics: each hypothesis draws
    3 source samples, pairs each with a random candidate among its
    ``randomness`` most-similar target descriptors
    (``setCorrespondenceRandomness(15)``, `cregistration.hpp:393`), and the
    winner minimizes the truncated full-cloud 1-NN error; all hypotheses
    are evaluated in one batched sweep instead of PCL's sequential loop.
    Returns (result, fitness) with PCL ``getFitnessScore`` semantics
    (masked mean squared 1-NN distance of the aligned source)."""
    k1, k2 = jax.random.split(key)
    f_src = compute_fpfh(src_xyz, src_normals, src_mask, 2.0 * search_radius)
    f_tgt = compute_fpfh(tgt_xyz, tgt_normals, tgt_mask, 2.0 * search_radius)
    d2 = (jnp.sum(f_src**2, -1)[:, None] - 2.0 * f_src @ f_tgt.T
          + jnp.sum(f_tgt**2, -1)[None, :])
    d2 = jnp.where(tgt_mask[None, :], d2, jnp.inf)
    _, topk = jax.lax.top_k(-d2, randomness)  # [Ns, randomness]
    return _sac_ia(src_xyz, src_mask, tgt_xyz, tgt_mask, topk, k2,
                   inlier_thre, num_hypotheses, num_score_pts, randomness,
                   min_inlier_count)
