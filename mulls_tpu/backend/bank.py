"""Device-resident submap bank — the round-3 back-end redesign.

The round-2 back-end `device_get`-ed the whole local map at every submap
boundary and ran coarse/fine/PGO as separate dispatches with host
decisions (and host<->device transfers of full submap clouds) between
them; on a tunneled accelerator each of those transfers pays a full link
round trip and the end-to-end SLAM rate collapsed to 2.3 fps while the
front-end ran at 36 (VERDICT round 2).

Redesign: submap feature clouds NEVER leave the device on the critical
path.  A fixed-capacity bank (leading ``S`` axis over every local-map
leaf) lives in HBM; storing a submap is one donated dynamic-update-slice,
and every back-end evaluation (adjacent map-to-map refinement, the whole
loop-closure candidate ladder: NCC matching -> GNC/RANSAC coarse ->
odometry double-check -> fine MULLS-ICP) runs as ONE jitted program over
bank slots, returning a small packed result vector.  Host round trips per
submap boundary drop from O(candidates * stages) full-cloud transfers to
2-4 fetches of <100 floats.

Reference behavior covered: `test/mulls_slam.cpp:451-628` (per-submap
back-end), `src/build_pose_graph.cpp:123-209` (candidate gates run on the
host from 9-float bound summaries), `mulls_slam.cpp:529-576` (coarse +
double-check + fine ladder, here batched over candidates with a
`lax.scan` instead of host ping-pong per pair).

Memory: one submap at the KITTI operating point is ~0.9 MB (19.5k masked
feature points + 2k descriptors); the default 192-slot bank is ~170 MB of
HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mulls_tpu.backend import coarse_reg as cr
from mulls_tpu.backend.ncc import match_ncc
from mulls_tpu.config import MullsConfig
from mulls_tpu.core.cloud import FeatureCloud, VertexDescriptors
from mulls_tpu.frontend.icp import mm_lls_icp

# packed RegResult row: 12 (T[:3,:]) + sigma + code + confidence + iters
# + 36 (info 6x6) = 52 floats
REG_ROW = 52
# loop row adds: coarse_used flag + coarse_valid flag + coarse T (12)
LOOP_ROW = REG_ROW + 2 + 12


@struct.dataclass
class SubmapBank:
    """Stacked local-map snapshots: every leaf carries a leading [S] axis."""

    clouds: Dict[str, FeatureCloud]
    desc: VertexDescriptors


def init_bank(template_clouds, template_desc, capacity: int) -> SubmapBank:
    """Allocate an all-zero bank shaped after one local map's pytree."""
    z = lambda x: jnp.zeros((capacity,) + x.shape, x.dtype)
    return SubmapBank(clouds=jax.tree.map(z, template_clouds),
                      desc=jax.tree.map(z, template_desc))


def _slot(tree, i):
    """Dynamic-index a bank pytree at slot ``i`` (traced ok)."""
    return jax.tree.map(lambda x: x[i], tree)


@partial(jax.jit, donate_argnums=(0,))
def bank_store(bank: SubmapBank, slot, clouds, desc) -> SubmapBank:
    """Write one local-map snapshot into ``slot`` (in-place DUS)."""
    return SubmapBank(
        clouds=jax.tree.map(lambda b, x: b.at[slot].set(x),
                            bank.clouds, clouds),
        desc=jax.tree.map(lambda b, x: b.at[slot].set(x), bank.desc, desc))


@jax.jit
def local_bounds(clouds) -> jnp.ndarray:
    """[6] = (min_xyz, max_xyz) of the submap's structural points in the
    submap's LOCAL frame.  World-frame bounds are derived on the host from
    the 8 transformed corners — the pose changes under PGO but the local
    extent never does, so bbx maintenance costs zero cloud traffic
    (`update_optimized_nodes` recomputes bbx, `graph_optimizer.cpp:
    778-798`)."""
    big = jnp.float32(1e9)
    mn = jnp.full((3,), big)
    mx = jnp.full((3,), -big)
    any_valid = jnp.bool_(False)
    for name in ("ground", "facade", "pillar"):
        c = clouds[name]
        m = c.mask[:, None]
        mn = jnp.minimum(mn, jnp.min(jnp.where(m, c.xyz, big), axis=0))
        mx = jnp.maximum(mx, jnp.max(jnp.where(m, c.xyz, -big), axis=0))
        any_valid = any_valid | jnp.any(c.mask)
    mn = jnp.where(any_valid, mn, jnp.full((3,), -1.0))
    mx = jnp.where(any_valid, mx, jnp.full((3,), 1.0))
    return jnp.concatenate([mn, mx])


def _pack_reg(res) -> jnp.ndarray:
    """RegResult -> [REG_ROW] f32."""
    return jnp.concatenate([
        res.transform[:3, :].reshape(-1),
        jnp.stack([res.sigma,
                   res.process_code.astype(jnp.float32),
                   res.confidence,
                   res.iterations.astype(jnp.float32)]),
        res.information.reshape(-1)])


def unpack_reg(row):
    """[>=REG_ROW] numpy row -> dict(T f64 [4,4], sigma, code, confidence,
    iterations, info [6,6] f64)."""
    import numpy as np
    T = np.eye(4)
    T[:3, :] = np.asarray(row[:12], np.float64).reshape(3, 4)
    return {
        "T": T,
        "sigma": float(row[12]),
        "code": int(row[13]),
        "confidence": float(row[14]),
        "iterations": int(row[15]),
        "info": np.asarray(row[16:52], np.float64).reshape(6, 6),
    }


def unpack_loop(row):
    """[LOOP_ROW] numpy row -> unpack_reg dict + coarse_used/coarse_valid
    flags + the coarse transform."""
    import numpy as np
    d = unpack_reg(row)
    d["coarse_used"] = bool(row[52] > 0.5)
    d["coarse_valid"] = bool(row[53] > 0.5)
    Tc = np.eye(4)
    Tc[:3, :] = np.asarray(row[54:66], np.float64).reshape(3, 4)
    d["T_coarse"] = Tc
    return d


# m2m fine-ICP source budget: the local-map submap clouds carry ~20k
# points per class; using them as the ICP SOURCE multiplies every
# NN-search matmul ~8x over the frame ICP (which registers ~2.6k down
# points) for no accuracy gain — correspondence count saturates in the
# low thousands.  The TARGET stays full (NN coverage).  Sources at or
# under the cap are untouched.
M2M_SRC_CAP = 4096


def _stride_src(clouds):
    """Static stride-subsample every feature class to <= M2M_SRC_CAP
    (ceiling stride, so e.g. 8191 points -> stride 2 -> 4096, never an
    over-cap 8191)."""
    out = {}
    for name, c in clouds.items():
        s = max(1, -(-c.xyz.shape[0] // M2M_SRC_CAP))
        out[name] = jax.tree.map(lambda x: x[::s], c) if s > 1 else c
    return out


@partial(jax.jit, static_argnames=("cfg", "max_iter"))
def pair_m2m(bank: SubmapBank, i, j, T_guess, cfg: MullsConfig,
             max_iter: int) -> jnp.ndarray:
    """Register submap ``j`` onto submap ``i`` from bank slots — the
    adjacent-edge refinement (`mulls_slam.cpp:477-498`) and the rare BEV
    retry both ride this one compiled program.  Returns [REG_ROW]."""
    tgt = _slot(bank.clouds, i)
    src = _stride_src(_slot(bank.clouds, j))
    res = mm_lls_icp(src, tgt, cfg.reg, T_guess, max_iter=max_iter)
    return _pack_reg(res)


@partial(jax.jit, static_argnames=("cfg",))
def loop_eval_batch(bank: SubmapBank, old_idx, j, T_guess, use_coarse,
                    check_mult, key, cfg: MullsConfig) -> jnp.ndarray:
    """Evaluate K loop-closure candidates against the newest submap in ONE
    device program (`mulls_slam.cpp:517-576` ladder, batched).

    Per candidate k (sequential `lax.scan` on device — K is small and the
    clouds are too large to vmap profitably):
      1. NCC descriptor matching old_k <- new (`:529`)
      2. GNC/RANSAC robust coarse alignment on the putative set (`:537`)
      3. odometry double-check of the coarse transform with per-candidate
         tolerance multipliers (`:551-555`)
      4. fine map-to-map MULLS-ICP from the checked coarse transform, else
         from the odometry prediction (`:560`)

    Deviation from the reference's sequential transfer logic: every
    candidate is evaluated from the PRE-transfer odometry prediction; the
    host applies accept/transfer ordering on the fetched results and
    re-dispatches the (rare) candidates whose guess a transfer would have
    changed.  Args: old_idx [K] i32 slots, j scalar slot, T_guess [K,4,4],
    use_coarse [K] bool, check_mult [K,2] f32, key PRNG.  Returns
    [K, LOOP_ROW].
    """
    s = cfg.submap
    src_full = _slot(bank.clouds, j)
    src = _stride_src(src_full)
    src_desc = _slot(bank.desc, j)
    keys = jax.random.split(key, old_idx.shape[0])

    def one(carry, inp):
        oi, Tg, uc, cm, k = inp
        tgt = _slot(bank.clouds, oi)
        tgt_desc = _slot(bank.desc, oi)
        m = match_ncc(tgt_desc, src_desc,
                      fixed_num_corr=s.best_n_feature_match_on,
                      corr_num=s.feature_corr_num,
                      reciprocal=s.reciprocal_feature_match_on)
        # NCC putative pairs index the FULL vertex cloud (descriptor rows
        # align with it); only the fine-ICP source below is strided
        p_src = src_full["vertex"].xyz[m.s_idx]
        p_tgt = tgt["vertex"].xyz[m.t_idx]
        pm = (m.valid & src_full["vertex"].mask[m.s_idx]
              & tgt["vertex"].mask[m.t_idx])
        nb = cfg.feature.cloud_pca_neigh_r
        if s.teaser_based_global_registration_on:
            cres = cr.coarse_reg_gnc(
                p_src, p_tgt, pm, k, noise_bound=nb,
                min_inlier_count=s.teaser_min_inlier_count)
        else:
            cres = cr.coarse_reg_ransac(
                p_src, p_tgt, pm, k, inlier_thre=2.0 * nb,
                min_inlier_count=s.teaser_min_inlier_count)
        checked = cr.double_check_tran(
            cres.transform, Tg,
            s.wrong_edge_tran_thre * cm[0],
            s.wrong_edge_rot_thre_deg * cm[1])
        coarse_ok = uc & cres.valid & checked
        T_init = jnp.where(coarse_ok, cres.transform, Tg)
        fres = mm_lls_icp(src, tgt, cfg.reg, T_init,
                          max_iter=cfg.reg.reg_max_iter_num_m2m)
        row = jnp.concatenate([
            _pack_reg(fres),
            jnp.stack([coarse_ok.astype(jnp.float32),
                       cres.valid.astype(jnp.float32)]),
            cres.transform[:3, :].reshape(-1)])
        return carry, row

    _, rows = jax.lax.scan(one, 0,
                           (old_idx, T_guess, use_coarse, check_mult, keys))
    return rows


@partial(jax.jit, static_argnames=("grid", "res"))
def pair_bev(bank: SubmapBank, i, j, grid: int = 320,
             res: float = 0.6):
    """BEV FFT-correlation coarse alignment of slot j onto slot i straight
    from the bank (the fallback basin search, `backend/coarse_reg.py
    coarse_reg_bev`) — no host cloud traffic.  Returns ([4,4], valid)."""
    tgt = _slot(bank.clouds, i)
    src = _slot(bank.clouds, j)
    sx, sm = cr.bev_feature_stack(src)
    tx, tm = cr.bev_feature_stack(tgt)
    out = cr.coarse_reg_bev(sx, sm, tx, tm, grid=grid, res=res)
    return out.transform, out.valid
