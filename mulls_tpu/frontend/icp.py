"""MULLS-ICP: multi-metric linear-least-squares ICP, TPU-native.

Re-design of the reference `mm_lls_icp` (`cregistration.hpp:1114-1440`):

* correspondences: tiled brute-force 1-NN per feature class
  (`determine_corres` parity: candidate gate at 2.5x threshold, one-source-
  per-target duplicate rejection, annealed per-class distance thresholds,
  normal/principal-direction consistency gate — `cregistration.hpp:1701-1835`)
* one joint 6x6 normal-equation system per iteration accumulating
  point-to-plane rows (ground/facade/roof), point-to-line rows
  (pillar/beam) and point-to-point rows (vertex) with the reference's four
  weighting schemes (`cregistration.hpp:1869-2275, 2686-2737`)
* the iteration loop is a `lax.while_loop` with the reference's divergence
  guards (-1 too-large step, -2 too-few correspondences, -3 posterior sigma
  too large) and convergence criteria
* f32-robustness: the normal equations are built in *centered* coordinates
  (source-centroid shift), which conditions ATPA so f32 suffices on TPU;
  the solution and information matrix are mapped back to the uncentered
  frame exactly.

Everything is masked: invalid correspondences contribute weight 0 to ATPA.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from mulls_tpu.config import RegConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import FeatureCloud
from mulls_tpu.ops.neighbors import nearest_neighbor

CLASS_ORDER = ("ground", "pillar", "facade", "beam", "roof", "vertex")
_PLANAR = {"ground": True, "facade": True, "roof": True,
           "pillar": False, "beam": False, "vertex": False}
# feature-type bitstring index (used_feature_type, `mulls_slam.cpp` order)
_TYPE_IDX = {"ground": 0, "pillar": 1, "facade": 2, "beam": 3, "roof": 4,
             "vertex": 5}


@struct.dataclass
class RegResult:
    transform: jnp.ndarray  # [4,4] source -> target
    information: jnp.ndarray  # [6,6] (tx,ty,tz,qx,qy,qz) parameterization
    sigma: jnp.ndarray  # posterior unit-weight std (m)
    confidence: jnp.ndarray  # necessary-corr ratio
    process_code: jnp.ndarray  # 1 ok | -1 diverged | -2 few corr | -3 sigma
    iterations: jnp.ndarray


class _Corr(NamedTuple):
    t_idx: jnp.ndarray  # [S] target index of the 1-NN
    valid: jnp.ndarray  # [S] bool
    sqdist: jnp.ndarray  # [S]


def _find_corres(s_xyz, s_dir, s_mask, target: FeatureCloud, dis_thre,
                 cos_bearing: float, normal_check: bool,
                 duplicate_check: bool = True,
                 normal_shooting: bool = False) -> _Corr:
    """determine_corres parity (`cregistration.hpp:1701-1835`)."""
    t_cap = target.capacity
    if normal_shooting:
        # --normal_shooting_on (`cregistration.hpp:1729-1737`): planar
        # classes pick the target with minimum perpendicular distance to
        # the source-normal ray instead of the Euclidean 1-NN; the gate at
        # 2.5x dis_thre is the reference's filter_dis_times cap
        from mulls_tpu.ops.neighbors import normal_shooting_neighbor
        idx, d2 = normal_shooting_neighbor(s_xyz, s_dir, s_mask,
                                           target.xyz, target.mask,
                                           2.5 * dis_thre)
    else:
        idx, d2 = nearest_neighbor(s_xyz, s_mask, target.xyz, target.mask)
    cand = s_mask & (d2 <= (2.5 * dis_thre) ** 2)
    if duplicate_check:
        # one source per target: keep the minimum-distance source
        # (two-stage segment-min: distance, then source ordinal tie-break;
        # int32-safe, no x64 required)
        n = s_xyz.shape[0]
        seg = jnp.where(cand, idx, t_cap)
        best_d2 = jax.ops.segment_min(jnp.where(cand, d2, jnp.inf), seg,
                                      num_segments=t_cap + 1)
        tied = cand & (d2 <= best_d2[idx])
        ordinal = jnp.arange(n, dtype=jnp.int32)
        best_ord = jax.ops.segment_min(
            jnp.where(tied, ordinal, jnp.int32(2 ** 30)),
            jnp.where(tied, idx, t_cap), num_segments=t_cap + 1)
        cand = tied & (best_ord[idx] == ordinal)
    keep = cand & (d2 <= dis_thre ** 2)
    if normal_check:
        tn = target.normal[idx]
        cosang = jnp.abs(jnp.sum(s_dir * tn, axis=-1))
        keep = keep & (cosang >= cos_bearing)
    return _Corr(t_idx=idx, valid=keep, sqdist=d2)


def _pt2pl_system(p, q, nt, w):
    """J = [n | p x n-ish], rhs d = n.(q-p) (`cregistration.hpp:2066-2156`)."""
    a = nt[:, 2] * p[:, 1] - nt[:, 1] * p[:, 2]
    b = nt[:, 0] * p[:, 2] - nt[:, 2] * p[:, 0]
    c = nt[:, 1] * p[:, 0] - nt[:, 0] * p[:, 1]
    J = jnp.stack([nt[:, 0], nt[:, 1], nt[:, 2], a, b, c], axis=-1)  # [N,6]
    d = jnp.sum(nt * (q - p), axis=-1)
    ATA = jnp.einsum("n,ni,nj->ij", w, J, J)
    ATb = jnp.einsum("n,ni,n->i", w, J, d)
    return ATA, ATb, J, d


def _pt2li_rows(p, v):
    """A [N,3,6] for the cross-product point-to-line residual
    (`cregistration.hpp:2195-2224`)."""
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
    zero = jnp.zeros_like(px)
    A = jnp.stack([
        jnp.stack([zero, -vz, vy, vy * py + vz * pz, -vy * px, -vz * px], -1),
        jnp.stack([vz, zero, -vx, -vx * py, vz * pz + vx * px, -vz * py], -1),
        jnp.stack([-vy, vx, zero, -vx * pz, -vy * pz, vx * px + vy * py], -1),
    ], axis=1)
    return A


def _pt2li_rhs(p, q, v):
    d = p - q
    bx = -v[:, 1] * d[:, 2] + v[:, 2] * d[:, 1]
    by = -v[:, 2] * d[:, 0] + v[:, 0] * d[:, 2]
    bz = -v[:, 0] * d[:, 1] + v[:, 1] * d[:, 0]
    return jnp.stack([bx, by, bz], axis=-1)


def _pt2pt_rows(p):
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    zero = jnp.zeros_like(px)
    one = jnp.ones_like(px)
    A = jnp.stack([
        jnp.stack([one, zero, zero, zero, pz, -py], -1),
        jnp.stack([zero, one, zero, -pz, zero, px], -1),
        jnp.stack([zero, zero, one, py, -px, zero], -1),
    ], axis=1)
    return A


def _rows_system(A, b, w):
    ATA = jnp.einsum("n,nki,nkj->ij", w, A, A)
    ATb = jnp.einsum("n,nki,nk->i", w, A, b)
    return ATA, ATb


def _weight_by_dist_adaptive(dist, iter_num, cfg: RegConfig):
    b = jnp.minimum(cfg.dist_weight_base_min
                    + cfg.dist_weight_base_step * iter_num,
                    cfg.dist_weight_base_max)
    w = b + (1.0 - b) * dist / cfg.dist_weight_unit_dist
    return jnp.maximum(w, 0.01)


def _weight_by_residual(res, window):
    # Huber (`cregistration.hpp:2710-2722`, delta=1)
    return jnp.where(res > window,
                     (2.0 * res * window - window * window)
                     / jnp.maximum(res * res, 1e-12),
                     1.0)


def _weight_by_intensity(pi, qi, scale):
    return jnp.exp(-jnp.abs(pi - qi) / scale)


def mm_lls_icp(source: Dict[str, FeatureCloud],
               target: Dict[str, FeatureCloud],
               cfg: RegConfig,
               init_guess: jnp.ndarray,
               max_iter: int,
               dis_thre_add=0.0) -> RegResult:
    """Register source onto target; returns T such that T @ source ~ target.

    ``cfg.used_feature_type`` selects classes at trace time (static).
    ``dis_thre_add`` (may be a traced scalar) widens the initial
    correspondence gate — the reference's ``add_length`` recovery: the
    frame after a failed registration re-converges through a looser gate
    (`mulls_slam.cpp:650-657, 686-693`: `reg_corr_dis_thre_init +
    add_length`).
    """
    used = [n for n in CLASS_ORDER
            if cfg.used_feature_type[_TYPE_IDX[n]] == "1" and n in source]
    cos_bearing = math.cos(math.radians(cfg.normal_bearing))
    strategy = cfg.corr_weight_strategy
    converge_rot = math.radians(cfg.converge_rot_d)
    max_rot = math.radians(cfg.max_bearable_rotation_d)
    max_tran = 2.0 * (cfg.corr_dis_thre_init + dis_thre_add)

    s_counts = {n: source[n].count for n in used}
    src_feature_count = sum(s_counts[n] for n in ("pillar", "facade", "beam")
                            if n in s_counts)
    src_feature_count = jnp.maximum(src_feature_count, 1)

    # intersection (bbx) filter (`cregistration.hpp:1186-1188, 2894`):
    # source points far outside the target's bounding box can never match
    if cfg.apply_intersection_filter:
        from mulls_tpu.core.cloud import masked_max, masked_min
        tmin = jnp.full((3,), jnp.inf)
        tmax = jnp.full((3,), -jnp.inf)
        for n in used:
            tmin = jnp.minimum(tmin, masked_min(
                target[n].xyz, target[n].mask[:, None], axis=0))
            tmax = jnp.maximum(tmax, masked_max(
                target[n].xyz, target[n].mask[:, None], axis=0))
        bbx_pad = 2.0 * cfg.corr_dis_thre_init
        tmin, tmax = tmin - bbx_pad, tmax + bbx_pad
    else:
        tmin = tmax = None

    init_thre = jnp.full((len(used),), cfg.corr_dis_thre_init,
                         jnp.float32) + dis_thre_add

    def body(state):
        (it, T, thre, done, code, sigma2, info, conf) = state

        corrs = {}
        s_pts = {}
        for ci, name in enumerate(used):
            sc = source[name]
            s_xyz = se3.transform_points(T, sc.xyz)
            s_dir = se3.rotate_vectors(T, sc.normal)
            s_mask = sc.mask
            if tmin is not None:
                s_mask = s_mask & jnp.all((s_xyz >= tmin)
                                          & (s_xyz <= tmax), axis=-1)
            corrs[name] = _find_corres(
                s_xyz, s_dir, s_mask, target[name], thre[ci], cos_bearing,
                normal_check=(name != "vertex"),
                normal_shooting=(cfg.normal_shooting_on and _PLANAR[name]))
            s_pts[name] = s_xyz

        cnt = {n: jnp.sum(corrs[n].valid) for n in used}
        total = sum(cnt.values())
        necessary = sum(cnt[n] for n in ("pillar", "facade", "beam") if n in cnt)
        conf_new = necessary / src_feature_count
        too_few = ((total < cfg.min_total_corr_num)
                   | (necessary < cfg.min_neccessary_corr_num)
                   | (conf_new < cfg.min_neccessary_corr_ratio))

        # x,y,z balance weight (`cregistration.hpp:1892-1900`)
        m1 = cnt.get("ground", 0) + cnt.get("roof", 0)
        m2, m3, m4 = (cnt.get("facade", 0), cnt.get("pillar", 0),
                      cnt.get("beam", 0))
        if strategy[0] == "1":
            w_ground = jnp.maximum(
                0.01, cfg.z_xy_balance_ratio * (m2 + 2 * m3 - m4)
                / (1e-4 + 2.0 * m1))
        else:
            w_ground = jnp.float32(1.0)
        class_w = {n: (w_ground if n in ("ground", "roof") else 1.0)
                   for n in used}

        # centered normal equations
        wsum = jnp.float32(1e-6)
        csum = jnp.zeros((3,), jnp.float32)
        for name in used:
            v = corrs[name].valid
            wsum = wsum + jnp.sum(v)
            csum = csum + jnp.sum(jnp.where(v[:, None], s_pts[name], 0.0), 0)
        center = csum / wsum

        ATA = jnp.zeros((6, 6), jnp.float32)
        ATb = jnp.zeros((6,), jnp.float32)
        vtpv = jnp.float32(0.0)
        nobs = jnp.float32(0.0)
        per_class = {}
        for name in used:
            sc, tc, corr = source[name], target[name], corrs[name]
            p = s_pts[name] - center
            q = tc.xyz[corr.t_idx] - center
            tn = tc.normal[corr.t_idx]
            pi, qi = sc.intensity, tc.intensity[corr.t_idx]
            w = jnp.where(corr.valid, class_w[name], 0.0)
            tdist = jnp.linalg.norm(tc.xyz[corr.t_idx], axis=-1)
            if strategy[2] == "1":
                w = w * _weight_by_dist_adaptive(tdist, it, cfg)
            if strategy[3] == "1":
                w = w * _weight_by_intensity(pi, qi, cfg.intensity_scale)
            if _PLANAR[name]:
                d = jnp.sum(tn * (q - p), axis=-1)
                if strategy[1] == "1":
                    rw = _weight_by_residual(jnp.abs(d), cfg.pt2pl_res_window)
                    w = w * jnp.where(it > cfg.residual_weight_after_iter,
                                      rw, 1.0)
                ata, atb, J, d = _pt2pl_system(p, q, tn, w)
                per_class[name] = ("pl", J, d, w)
            elif name == "vertex":
                A = _pt2pt_rows(p)
                b = -(p - q)
                if strategy[1] == "1":
                    rw = _weight_by_residual(jnp.linalg.norm(p - q, axis=-1),
                                             cfg.pt2pt_res_window)
                    w = w * jnp.where(it > cfg.residual_weight_after_iter,
                                      rw, 1.0)
                ata, atb = _rows_system(A, b, w)
                per_class[name] = ("li", A, b, w)
            else:  # pillar / beam: point-to-line via primary direction
                A = _pt2li_rows(p, tn)
                b = _pt2li_rhs(p, q, tn)
                if strategy[1] == "1":
                    rw = _weight_by_residual(jnp.linalg.norm(b, axis=-1),
                                             cfg.pt2li_res_window)
                    w = w * jnp.where(it > cfg.residual_weight_after_iter,
                                      rw, 1.0)
                ata, atb = _rows_system(A, b, w)
                per_class[name] = ("li", A, b, w)
            ATA = ATA + ata
            ATb = ATb + atb

        # solve (ridge epsilon keeps the all-masked case finite)
        ATA_r = ATA + 1e-6 * jnp.eye(6, dtype=jnp.float32)
        x = jnp.linalg.solve(ATA_r, ATb)

        # degeneracy-aware solution remapping (extension; LOAM-style but
        # scale-free): whiten by the diagonal so the 6x6 becomes a unit-
        # diagonal correlation matrix, then zero the update along
        # eigendirections with eigenvalue < degeneracy_thre — those
        # directions are (nearly) unobservable this frame and the motion-
        # model initial guess is a better estimate than correspondence
        # noise.  Residual sigma cannot see this failure mode: a corridor
        # or open intersection yields a confident, wrong along-track step.
        if cfg.degeneracy_thre > 0.0:
            # scale balance: rotation params act through the moment arm, so
            # divide them by the system's own characteristic radius rho
            # (trace ratio of the rotation/translation blocks); then
            # normalize by the effective correspondence weight so an
            # eigenvalue reads as "fraction of the weight constraining
            # this direction"
            tr_t = jnp.trace(ATA_r[:3, :3])
            tr_r = jnp.trace(ATA_r[3:, 3:])
            rho = jnp.sqrt(jnp.maximum(tr_r, 1e-9)
                           / jnp.maximum(tr_t, 1e-9))
            s_bal = jnp.concatenate([jnp.ones(3, jnp.float32),
                                     jnp.full(3, rho, jnp.float32)])
            norm = jnp.maximum(tr_t / 3.0, 1e-9)
            Ahat = ATA_r / s_bal[:, None] / s_bal[None, :] / norm
            lam, Vh = jnp.linalg.eigh(Ahat)
            keep = (lam >= cfg.degeneracy_thre).astype(jnp.float32)
            z = s_bal * x
            x = (Vh @ (keep * (Vh.T @ z))) / s_bal

        # residuals at the solution -> posterior sigma^2
        for name in used:
            kind, A_or_J, b_or_d, w = per_class[name]
            if kind == "pl":
                r = A_or_J @ x - b_or_d
                vtpv = vtpv + jnp.sum(w * r * r)
                nobs = nobs + jnp.sum(w > 0)
            else:
                r = jnp.einsum("nkj,j->nk", A_or_J, x) - b_or_d
                vtpv = vtpv + jnp.sum(w * jnp.sum(r * r, -1))
                nobs = nobs + 3.0 * jnp.sum(w > 0)
        sigma2_new = vtpv / jnp.maximum(nobs - 6.0, 1.0)

        # un-center: T_step = Trans(c) @ T'(x) @ Trans(-c)
        Tp = se3.from_x(x)
        Tc = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(center)
        Tci = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-center)
        T_step = Tc @ Tp @ Tci

        # information matrix in the uncentered frame:
        # x_unc = G x_cent with G = [[I, skew(c)],[0, I]]
        # => ATA_unc = G^-T ATA G^-1
        Ginv = jnp.eye(6, dtype=jnp.float32)
        Ginv = Ginv.at[:3, 3:].set(-se3.skew(center))
        ATA_unc = Ginv.T @ ATA_r @ Ginv
        # euler -> quaternion covariance propagation
        # (`cregistration.hpp:1953-1964, 2795-2836`)
        Jq = se3.quat_euler_jacobi(x[3:6])
        Jbig = jnp.eye(6, dtype=jnp.float32).at[3:, 3:].set(Jq)
        cof = jnp.linalg.inv(ATA_unc)
        cof_q = Jbig @ cof @ Jbig.T
        info_new = jnp.linalg.inv(cof_q + 1e-12 * jnp.eye(6)) / jnp.maximum(
            sigma2_new, 1e-12)

        step_t = jnp.linalg.norm(T_step[:3, 3])
        step_r = se3.rotation_angle(T_step[:3, :3])
        diverged = (step_t > max_tran) | (step_r > max_rot)
        converged = (it > 2) & (step_t < cfg.converge_tran) & \
                    (step_r < converge_rot)
        last_iter = it >= max_iter - 1

        # status codes (`cregistration.hpp:1131-1136`)
        sigma_bad = jnp.sqrt(sigma2_new) >= cfg.sigma_thre
        code_new = jnp.where(
            too_few, -2,
            jnp.where(diverged, -1,
                      jnp.where((converged | last_iter) & sigma_bad, -3,
                                jnp.where(converged | last_iter, 1, 0))))
        done_new = too_few | diverged | converged | last_iter

        apply_step = ~(too_few | diverged)
        T_new = jnp.where(apply_step, T_step @ T, T)

        # anneal thresholds for the next iteration
        thre_new = jnp.maximum(thre / cfg.dis_thre_update_rate,
                               cfg.corr_dis_thre_min)

        return (it + 1, T_new, thre_new, done_new,
                code_new.astype(jnp.int32),
                jnp.where(apply_step, sigma2_new, sigma2),
                jnp.where(apply_step, info_new, info),
                conf_new)

    def cond(state):
        it, _, _, done, *_ = state
        return (~done) & (it < max_iter)

    state0 = (jnp.int32(0), init_guess.astype(jnp.float32), init_thre,
              jnp.bool_(False), jnp.int32(0), jnp.float32(1.0),
              jnp.eye(6, dtype=jnp.float32), jnp.float32(1.0))
    it, T, _, _, code, sigma2, info, conf = jax.lax.while_loop(
        cond, body, state0)

    # re-orthonormalize the accumulated rotation
    R = se3.orthonormalize(T[:3, :3])
    T = T.at[:3, :3].set(R)
    return RegResult(transform=T, information=info,
                     sigma=jnp.sqrt(sigma2), confidence=conf,
                     process_code=code, iterations=it)


def ground_3dof_estimate(source_ground: FeatureCloud,
                         target_ground: FeatureCloud,
                         cfg: RegConfig,
                         init_guess: jnp.ndarray,
                         max_iter: int = 10) -> RegResult:
    """LeGO-LOAM-style two-step variant: estimate only (tz, roll, pitch)
    from ground point-to-plane correspondences
    (`lls_icp_3dof_ground`, `cregistration.hpp:1443-1582, 2278-2320`)."""
    cos_bearing = math.cos(math.radians(cfg.normal_bearing))

    def body(state):
        it, T, thre, done, sigma2 = state
        s_xyz = se3.transform_points(T, source_ground.xyz)
        s_dir = se3.rotate_vectors(T, source_ground.normal)
        corr = _find_corres(s_xyz, s_dir, source_ground.mask, target_ground,
                            thre, cos_bearing, normal_check=True)
        q = target_ground.xyz[corr.t_idx]
        tn = target_ground.normal[corr.t_idx]
        w = corr.valid.astype(jnp.float32)
        _, _, J, d = _pt2pl_system(s_xyz, q, tn, w)
        # columns (tz, alpha, beta) of the full 6-dof jacobian
        J3 = J[:, jnp.asarray([2, 3, 4])]
        ATA = jnp.einsum("n,ni,nj->ij", w, J3, J3) + 1e-6 * jnp.eye(3)
        ATb = jnp.einsum("n,ni,n->i", w, J3, d)
        x3 = jnp.linalg.solve(ATA, ATb)
        x6 = jnp.zeros((6,)).at[jnp.asarray([2, 3, 4])].set(x3)
        T_step = se3.from_x(x6)
        r = J3 @ x3 - d
        nobs = jnp.maximum(jnp.sum(w) - 3.0, 1.0)
        sigma2_new = jnp.sum(w * r * r) / nobs
        T_new = T_step @ T
        step = jnp.linalg.norm(x3)
        done_new = (it >= 2) & (step < cfg.converge_tran)
        thre_new = jnp.maximum(thre / cfg.dis_thre_update_rate,
                               cfg.corr_dis_thre_min)
        return (it + 1, T_new, thre_new, done_new, sigma2_new)

    def cond(state):
        it, _, _, done, _ = state
        return (~done) & (it < max_iter)

    it, T, _, _, sigma2 = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_guess.astype(jnp.float32),
                     jnp.float32(cfg.corr_dis_thre_init), jnp.bool_(False),
                     jnp.float32(1.0)))
    T = T.at[:3, :3].set(se3.orthonormalize(T[:3, :3]))
    return RegResult(transform=T, information=jnp.eye(6),
                     sigma=jnp.sqrt(sigma2), confidence=jnp.float32(1.0),
                     process_code=jnp.int32(1), iterations=it)


def mm_lls_icp_4dof_global(source: Dict[str, FeatureCloud],
                           target: Dict[str, FeatureCloud],
                           cfg: RegConfig,
                           heading_step_d: float = 15.0,
                           max_iter: int = 12):
    """TLS-style global registration: brute-force heading sweep, one
    MULLS-ICP per trial yaw, keep the best (sigma, confidence) score
    (`mm_lls_icp_4dof_global`, `cregistration.hpp:1584-1681`)."""
    n_try = max(int(round(360.0 / heading_step_d)), 1)
    yaws = jnp.asarray(
        [math.radians(k * heading_step_d) for k in range(n_try)],
        jnp.float32)

    def one(yaw):
        init = se3.make_transform(jnp.zeros(3),
                                  jnp.stack([0.0 * yaw, 0.0 * yaw, yaw]))
        return mm_lls_icp(source, target, cfg, init, max_iter=max_iter)

    results = jax.lax.map(one, yaws)
    ok = results.process_code == 1
    score = jnp.where(ok, results.confidence / jnp.maximum(results.sigma,
                                                           1e-4), -1.0)
    best = jnp.argmax(score)
    pick = lambda x: jax.tree_util.tree_map(lambda a: a[best], x)
    return pick(results), jnp.degrees(yaws[best]), score[best]
