"""The LiDAR odometry loop — the `mulls_slam` front-end driver
(reference `test/mulls_slam.cpp:386-803`, call stack SURVEY.md §3.1).

TPU-native structure: the whole per-frame pipeline

    extract_features -> scan-to-map MULLS-ICP -> pose composition ->
    local-map update (incl. dynamic removal + motion-model bookkeeping)

is ONE jitted program (`slam_step`) whose state (local map, pose, previous
relative transform) lives on device and is donated between frames.  The
host loop only uploads raw scans and enqueues steps — JAX's async dispatch
pipelines upload/compute across frames, and nothing is read back until the
end of the run.  This removes the host<->device round-trip per stage that
dominates when the accelerator sits behind a network tunnel.

Failure handling follows the reference (`mulls_slam.cpp:686-693`): on a
negative registration code the frame falls back to the motion-model guess
and the next initial guess resets to identity — implemented with masked
selects on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mulls_tpu.config import MullsConfig
from mulls_tpu.core import se3
from mulls_tpu.core.cloud import (PackedRawCloud, RawCloud, pack_raw_host,
                                  unpack_raw)
from mulls_tpu.frontend.features import extract_features
from mulls_tpu.frontend.icp import mm_lls_icp
from mulls_tpu.mapping.local_map import (LocalMap, init_local_map,
                                         update_local_map)


@struct.dataclass
class SlamState:
    local_map: LocalMap
    pose: jnp.ndarray  # [4,4] f32, lidar pose of the last processed frame
    T_prev: jnp.ndarray  # [4,4] previous relative transform (motion model)
    frame_idx: jnp.ndarray  # int32
    key: jax.Array
    # previous frame's down feature clouds — present only when the
    # scan-to-scan module is on (static in cfg, so the pytree structure is
    # consistent per compiled program)
    prev_frame: object = None
    # dynamic non-ground stochastic-downsample rate — the live part of the
    # reference's self-adaptive parameter update
    # (`update_parameters_self_adaptive`, `cfilter.hpp:2416-2444`)
    nonground_rate: jnp.ndarray = None
    # correspondence-gate widening for the NEXT frame after a failed
    # registration (the reference's `add_length`,
    # `mulls_slam.cpp:650-657, 686-693`); 0 when healthy
    add_length: jnp.ndarray = None
    # EMA of healthy-frame registration confidence — the run's own
    # baseline; drops relative to it arm the recovery gate and pause
    # dynamic removal (cfg.map.*_confidence_drop).  Negative = unseeded
    conf_ema: jnp.ndarray = None
    # frames since the last HEALTHY registration (0 after a code-1 frame);
    # the motion-model prior is trusted for the dynamic-suspect veto only
    # while this is small
    model_age: jnp.ndarray = None


@struct.dataclass
class StepOut:
    T_rel: jnp.ndarray  # [4,4]
    pose: jnp.ndarray  # [4,4]
    sigma: jnp.ndarray
    code: jnp.ndarray
    confidence: jnp.ndarray
    iterations: jnp.ndarray
    # everything above packed as one [16] f32 vector so a whole run's
    # results come back in a single device->host transfer (each D2H pays a
    # full link round trip; per-field fetches dominated wall-clock)
    vec: jnp.ndarray

    @staticmethod
    def pack_vec(T_rel, sigma, code, confidence, iterations):
        return jnp.concatenate([
            T_rel[:3, :].ravel(),
            jnp.stack([sigma, code.astype(jnp.float32), confidence,
                       iterations.astype(jnp.float32)])])

    @staticmethod
    def unpack_vecs(vecs: np.ndarray):
        """[N,16] -> (T_rels [N,4,4] f64, sigmas [N], codes [N], conf [N],
        iters [N])."""
        n = vecs.shape[0]
        T = np.tile(np.eye(4), (n, 1, 1))
        T[:, :3, :] = vecs[:, :12].reshape(n, 3, 4).astype(np.float64)
        return (T, vecs[:, 12].astype(np.float64),
                vecs[:, 13].astype(np.int32), vecs[:, 14].astype(np.float64),
                vecs[:, 15].astype(np.int32))


def RegResultLike(T):
    """Structure-matching dummy RegResult (code 0 = not run)."""
    from mulls_tpu.frontend.icp import RegResult
    return RegResult(transform=T, information=jnp.eye(6, dtype=jnp.float32),
                     sigma=jnp.float32(1.0), confidence=jnp.float32(0.0),
                     process_code=jnp.int32(0), iterations=jnp.int32(0))


def _carries_prev_frame(cfg: MullsConfig) -> bool:
    """The previous frame's FULL feature clouds ride the scan carry when
    any scan-to-scan registration can happen: the s2s module, or the
    reference's ALWAYS-ON warm-up (`mulls_slam.cpp:631`:
    `scan_to_scan_module_on || i <= initial_scan2scan_frame_num` — the
    first frames register frame-to-frame because the local map is one
    thin frame; registering s2m there converges fine but starves the
    minimum-correspondence gates and ghost-appends the failed frames)."""
    return (cfg.map.scan_to_scan_module_on
            or cfg.map.initial_scan2scan_frame_num > 0)


def init_state(cfg: MullsConfig) -> SlamState:
    prev = None
    if _carries_prev_frame(cfg):
        from mulls_tpu.core.cloud import FeatureCloud
        s = cfg.shapes
        # FULL-capacity classes: the reference's s2s registers the new
        # frame's down clouds against the previous frame's full feature
        # sets (its target cblock carries them), not the down sets
        prev = {
            "ground": FeatureCloud.empty(s.n_ground_full),
            "pillar": FeatureCloud.empty(s.n_pillar_full),
            "facade": FeatureCloud.empty(s.n_facade_full),
            "beam": FeatureCloud.empty(s.n_beam_full),
            "roof": FeatureCloud.empty(s.n_roof_full),
            # the full vertex cloud is the top-k keep set, not an
            # n_vertex_full-capacity cloud (frontend/features.py)
            "vertex": FeatureCloud.empty(
                max(1, cfg.feature.vertex_keep_num)),
        }
    return SlamState(
        local_map=init_local_map(cfg.map),
        pose=jnp.eye(4, dtype=jnp.float32),
        T_prev=jnp.eye(4, dtype=jnp.float32),
        frame_idx=jnp.int32(0),
        key=jax.random.key(cfg.seed),
        prev_frame=prev,
        nonground_rate=jnp.float32(cfg.ground.gf_nonground_down_rate),
        add_length=jnp.float32(0.0),
        conf_ema=jnp.float32(-1.0),
        model_age=jnp.int32(99),
    )


def _feature_stage(state: SlamState, raw, cfg: MullsConfig, k_feat):
    """Stage 1 (reference timing column 'feature'): motion-comp prep +
    extract_semantic_pts + self-adaptive parameter update."""
    if isinstance(raw, PackedRawCloud):
        raw = unpack_raw(raw)  # scans travel quantized; decode on device

    # motion compensation (`cfilter.hpp:412-549`, `mulls_slam.cpp:704-715`).
    # timing="post" (reference-faithful, default): only stamp per-point
    # timestamp ratios here; the feature clouds are undistorted AFTER
    # registration with the measured T_rel (see _undistort_frame).
    # timing="pre": undistort the raw scan up front with the uniform-motion
    # prediction T_prev ~ T_rel, like the reference's optional
    # first-iteration compensation (`cregistration.hpp:1249-1258`).
    if cfg.map.motion_compensation_method > 0:
        from mulls_tpu.ops import motion
        s = (motion.timestamp_ratio_from_azimuth(raw.xyz, raw.mask)
             if cfg.map.motion_compensation_method == 2 else raw.ts_ratio)
        if cfg.map.motion_compensation_timing == "pre":
            xyz_u = motion.undistort(raw.xyz, s, raw.mask, state.T_prev)
            raw = raw.replace(xyz=xyz_u, ts_ratio=s)
        else:
            raw = raw.replace(ts_ratio=s)

    frame = extract_features(
        raw, cfg, k_feat,
        nonground_rate=(state.nonground_rate
                        if cfg.feature.adaptive_parameters_on else None))

    # self-adaptive parameter update (`cfilter.hpp:2416-2444`): too few
    # non-ground features this frame -> lower the stochastic downsample
    # rate (keep more points) for the next frame
    ng_rate = state.nonground_rate
    if cfg.feature.adaptive_parameters_on:
        ng_count = (jnp.sum(frame.down["facade"].mask)
                    + jnp.sum(frame.down["pillar"].mask)).astype(jnp.float32)
        min_exp = jnp.float32(cfg.feature.adaptive_nonground_min_expected)
        lowered = jnp.maximum(1.0, ng_rate
                              - min_exp / jnp.maximum(ng_count, 1.0))
        ng_rate = jnp.where(ng_count < min_exp, lowered, ng_rate)
    return frame, ng_rate


def _fractional_step(T_base: jnp.ndarray, T_full: jnp.ndarray,
                     inv_n: jnp.ndarray) -> jnp.ndarray:
    """``T_base ⊕ frac(delta)`` where ``delta = T_base⁻¹ T_full`` with its
    rotation angle and translation scaled by ``inv_n`` — the screw-motion
    interpolation used to convert a blackout-spanning re-acquisition step
    back into a per-frame motion model."""
    delta = se3.inverse(T_base) @ T_full
    R = delta[:3, :3]
    theta = se3.rotation_angle(R)
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                   R[1, 0] - R[0, 1]])
    axis = w / jnp.maximum(2.0 * jnp.sin(theta), 1e-6)
    R_f = se3.so3_exp(axis * theta * inv_n)
    delta_f = (jnp.eye(4, dtype=jnp.float32)
               .at[:3, :3].set(R_f)
               .at[:3, 3].set(delta[:3, 3] * inv_n))
    return T_base @ delta_f


def _register_stage(state: SlamState, frame, cfg: MullsConfig):
    """Stage 2 (reference timing column 'reg'): scan-to-scan + scan-to-map
    MULLS-ICP with cadence, in-frame retry, recovery bookkeeping, pose
    composition."""
    first = state.frame_idx == 0
    if cfg.map.initial_guess_mode == 2:
        guess = state.T_prev
    elif cfg.map.initial_guess_mode == 1:
        guess = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(state.T_prev[:3, 3])
    else:
        guess = jnp.eye(4, dtype=jnp.float32)
    guess0 = guess  # raw motion-model prior (pre-s2s) for the sanity veto

    # optional scan-to-scan pre-registration: refine the motion-model
    # guess against the previous frame's features before scan-to-map
    # (`mulls_slam.cpp:631-665`)
    # `add_length` correspondence-gate widening (`mulls_slam.cpp:650-657,
    # 686-693`): the frame after a failure re-converges through a looser
    # gate (+1.0 m); scan-to-map after an in-frame scan-to-scan pass gets
    # +1.0 on s2s success / +0.8 on s2s failure, like the reference's
    # in-frame add_length hand-off.  (The reference arms this under its
    # interactive mode; applied unconditionally here — the headless
    # reference's no-widening failure cascade on sharp turns is exactly
    # what it prevents, docs/ACCURACY.md.)
    warm = state.frame_idx <= cfg.map.initial_scan2scan_frame_num
    if cfg.map.scan_to_scan_module_on:
        s2s = mm_lls_icp(frame.down, state.prev_frame, cfg.reg, guess,
                         max_iter=cfg.reg.reg_max_iter_num_s2s,
                         dis_thre_add=state.add_length)
        guess = jnp.where(s2s.process_code == 1, s2s.transform, guess)
        s2m_add = jnp.where(s2s.process_code == 1, 1.0, 0.8)
    elif _carries_prev_frame(cfg) and cfg.map.warmup_s2s_on:
        # module OFF but warm-up ON (the reference default: s2s for the
        # first `initial_scan2scan_frame_num` frames, `mulls_slam.cpp:
        # 631` — the 1-frame local map starves the s2m count gates even
        # though the solve converges).  lax.cond keeps the warm-up ICP
        # off the critical path after the first frames (single-sequence
        # jit; the multiseq pipeline uses a warm/steady program split)
        def _warm_s2s():
            return mm_lls_icp(frame.down, state.prev_frame, cfg.reg,
                              guess,
                              max_iter=cfg.reg.reg_max_iter_num_s2s,
                              dis_thre_add=state.add_length
                              + jnp.float32(1.0))

        def _dummy():
            return RegResultLike(guess)

        s2s = jax.lax.cond(warm, _warm_s2s, _dummy)
        s2m_add = state.add_length
    else:
        s2m_add = state.add_length

    res = mm_lls_icp(frame.down, state.local_map.clouds, cfg.reg, guess,
                     max_iter=cfg.reg.reg_max_iter_num_s2m,
                     dis_thre_add=s2m_add)

    # scan-to-map cadence (`mulls_slam.cpp:631,667`): within the first
    # `initial_scan2scan_frame_num` frames, or on frames skipped by
    # `s2m_frequency`, the scan-to-scan result stands instead of s2m.
    have_s2s = (cfg.map.scan_to_scan_module_on
                or (_carries_prev_frame(cfg) and cfg.map.warmup_s2s_on))
    cadence_sel = jnp.bool_(False)
    if have_s2s and (cfg.map.s2m_frequency > 1
                     or cfg.map.initial_scan2scan_frame_num > 0):
        idx = state.frame_idx
        use_s2s = ((idx <= cfg.map.initial_scan2scan_frame_num)
                   | (idx % cfg.map.s2m_frequency != 0))
        s2s_ok = s2s.process_code == 1
        cadence_sel = use_s2s & s2s_ok
        res = res.replace(
            transform=jnp.where(use_s2s & s2s_ok, s2s.transform,
                                res.transform),
            sigma=jnp.where(use_s2s & s2s_ok, s2s.sigma, res.sigma),
            process_code=jnp.where(use_s2s & s2s_ok, s2s.process_code,
                                   res.process_code),
            confidence=jnp.where(use_s2s & s2s_ok, s2s.confidence,
                                 res.confidence),
            iterations=jnp.where(use_s2s & s2s_ok, s2s.iterations,
                                 res.iterations))

    # a hard failure OR a confidence dip relative to the run's own
    # baseline flags a suspect solve — a starved registration (e.g. corner
    # exit with an over-rotated motion-model guess) can converge on a
    # handful of correspondences with a deceptively low sigma one frame
    # before failing outright.  The baseline is an EMA of healthy-frame
    # confidence (absolute thresholds would misfire in sparse scenes
    # whose steady-state confidence is legitimately low)
    ema = state.conf_ema
    baseline = jnp.where(ema < 0.0, res.confidence, ema)

    def _suspect(r):
        return (r.process_code < 0) | (
            r.confidence < cfg.map.add_length_confidence_drop * baseline)

    # in-frame retry through a WIDER gate than the first attempt (+1.0 m
    # on top of whatever the first attempt used — with the s2s module on
    # the first s2m already runs widened, so "retry with +1.0" would be a
    # bit-identical no-op): instead of paying a bad frame and recovering
    # on the NEXT one (the reference's add_length pattern), re-run the
    # registration immediately when the first attempt is suspect.
    # lax.cond keeps the second ICP off the critical path on healthy
    # frames (under the multiseq vmap it lowers to select — acceptable)
    # cadence-selected scan-to-scan frames must not be overridden by an
    # s2m retry against the (deliberately skipped) thin warm-up map
    if cfg.map.inframe_recovery_on:
        suspect0 = _suspect(res) & ~cadence_sel
        retry = jax.lax.cond(
            suspect0,
            lambda: mm_lls_icp(frame.down, state.local_map.clouds, cfg.reg,
                               guess, max_iter=cfg.reg.reg_max_iter_num_s2m,
                               dis_thre_add=s2m_add + jnp.float32(1.0)),
            lambda: res)
        take = suspect0 & (retry.process_code == 1) \
            & (retry.confidence > res.confidence)
        res = jax.tree.map(lambda a, b: jnp.where(take, a, b), retry, res)

    # --- moving-object sanity veto + source-cleaned re-registration ----
    # A close oncoming mover's points form a CONSISTENT correspondence
    # bloc onto their own previous position: the solve converges
    # confidently ~the mover's relative motion away from truth (sigma AND
    # confidence look healthy — no gate above can see it), poisons the
    # motion model, and the next frames cascade (dynamic world seed 1009
    # frames 56-59: 4.7 m acquired in 4 frames).  A healthy-looking step
    # deviating from the WARM motion-model prior by more than
    # `dynamic_step_sanity_thre` (0.6 m/frame = 6 m/s of acceleration at
    # 10 Hz — far beyond any vehicle) is dynamic-suspect: re-register
    # with suspect sources removed.  Suspects = down points whose 1-NN
    # residual against the model-aligned local map is beyond
    # `dynamic_dist_thre_min` — the reference's map-side dynamic gate
    # (`map_manager.cpp:145-256`) applied to the registration source.
    # The veto compares against guess0, so it is meaningful only when
    # guess0 actually encodes predicted motion (initial_guess_mode 2, the
    # constant-velocity prior).  With mode 0/1 guess0 is identity (or
    # translation-only), dev0 would equal the full per-frame motion and
    # every healthy frame on a moving platform would be vetoed.
    sanity_thre = cfg.map.dynamic_step_sanity_thre
    if (cfg.map.map_based_dynamic_removal_on and sanity_thre > 0
            and cfg.map.initial_guess_mode == 2
            and cfg.map.dynamic_sanity_veto_on):
        from mulls_tpu.ops.neighbors import nearest_neighbor
        # the prior is trusted while recently confirmed: a persisted
        # constant-velocity model stays accurate for a few frames through
        # isolated failures, but after a long blackout a genuinely
        # different re-acquisition step must not be vetoed
        model_warm = ((state.frame_idx
                       > cfg.map.initial_scan2scan_frame_num + 1)
                      & (state.model_age <= 3))
        dev0 = jnp.linalg.norm(res.transform[:3, 3] - guess0[:3, 3])
        suspect_dyn = (model_warm & (res.process_code == 1)
                       & (dev0 > sanity_thre))
        dyn_gate2 = jnp.float32(cfg.map.dynamic_dist_thre_min) ** 2

        def _suspect_branch():
            """Hypothesis test + cleaned re-registration for a suspect
            frame.  A mover-captured solve aligns only the mover's point
            bloc with the map, while a GENUINE platform-motion change
            (hard braking, the mirrored bench playlist's turn-arounds)
            aligns the whole static structure — so count the non-ground
            structural points supported by the map under each hypothesis
            (ground is translation-invariant and supports both, hence
            excluded).  Round-5: the count is weighted by each point's
            OBSERVABILITY along the deviation direction u — a planar
            feature only constrains motion along its normal (|n.u|), a
            linear feature only transverse to its axis (sqrt(1-(d.u)^2)),
            a vertex fully.  The round-4 unweighted count could not
            discriminate a mover-following slide down a street (facades
            parallel to the street support BOTH hypotheses along their
            own plane — docs/accuracy/NOTES.md dynamic_s1009 frame 57);
            directionally weighted, those facades count ~0 while pillars
            and vertices keep their full vote, and a genuine turn-around
            (deviation transverse to vertical pillars) still registers
            as genuine.
            The SUPPORT gate scales with the hypothesis separation:
            half of dev0, clamped to [1x, 3x] the dynamic gate.  The
            round-4 fixed 0.3 m gate was sampling-limited against the
            ~1 m-spaced budgeted map (measured: ~25 vs ~10 votes for a
            2.4 m capture vs the true prior — decided by noise), but a
            FIXED 0.9 m gate overshot the other way: at a genuine
            1.4 m turn-around the displaced prior picks up accidental
            sub-0.9 m votes from ~1 m-spaced structure and the ratio
            test vetoed a true reversal (bench playlist frame 236).
            Half-the-separation keeps the two hypotheses' vote sets
            disjoint at any deviation while staying as wide as the
            sampling needs.  The CLEANING mask keeps the tight gate
            (its job is culling mover points, not voting).
            Also runs the mover-cleaned re-registration from
            the prior (sources within the dynamic gate of the
            prior-aligned map, `map_manager.cpp:145-256` applied to the
            source)."""
            du = res.transform[:3, 3] - guess0[:3, 3]
            dev = jnp.linalg.norm(du)
            u = du / jnp.maximum(dev, 1e-6)
            sup_gate2 = jnp.clip((0.5 * dev) ** 2, dyn_gate2,
                                 9.0 * dyn_gate2)
            sup_res = jnp.float32(0)
            sup_prior = jnp.float32(0)
            cleaned = {}
            for name, c in frame.down.items():
                m = state.local_map.clouds[name]
                p_xyz = se3.transform_points(guess0, c.xyz)
                _, d2p = nearest_neighbor(p_xyz, c.mask, m.xyz, m.mask)
                cleaned[name] = c.replace(mask=c.mask & (d2p < dyn_gate2))
                if name in ("pillar", "facade", "beam", "vertex"):
                    r_xyz = se3.transform_points(res.transform, c.xyz)
                    _, d2r = nearest_neighbor(r_xyz, c.mask, m.xyz, m.mask)
                    a = jnp.abs(se3.rotate_vectors(guess0, c.normal) @ u)
                    if name == "facade":
                        w = a
                    elif name == "vertex":
                        w = jnp.ones_like(a)
                    else:  # pillar/beam: axis direction in `normal`
                        w = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))
                    sup_res = sup_res + jnp.sum(
                        w * (c.mask & (d2r < sup_gate2)))
                    sup_prior = sup_prior + jnp.sum(
                        w * (c.mask & (d2p < sup_gate2)))
            res2_ = mm_lls_icp(cleaned, state.local_map.clouds, cfg.reg,
                               guess0,
                               max_iter=cfg.reg.reg_max_iter_num_s2m,
                               dis_thre_add=s2m_add)
            return sup_res, sup_prior, res2_

        sup_res, sup_prior, res2 = jax.lax.cond(
            suspect_dyn, _suspect_branch,
            lambda: (jnp.float32(0), jnp.float32(0), res))
        # the deviant solve explains clearly more static structure than
        # the prior: the platform genuinely moved — the original result
        # stands (a vetoed turn-around once cascaded into a silently
        # corrupted map here: the cleaned solve kept only ground +
        # aliased structure and "confirmed" the wrong prior)
        genuine = suspect_dyn & (sup_res > 1.2 * sup_prior + 5)
        dev2 = jnp.linalg.norm(res2.transform[:3, 3] - guess0[:3, 3])
        # accept the cleaned solve only if it kept enough structure to be
        # trustworthy (a starved ground-mostly solve parks at the prior)
        take2 = (suspect_dyn & ~genuine & (res2.process_code == 1)
                 & (dev2 <= sanity_thre)
                 & (res2.confidence >= 0.5 * res.confidence))
        res = jax.tree.map(lambda a, b: jnp.where(take2, a, b), res2, res)
        # still deviant after cleaning: hold the motion model this frame
        # (code -4, a veto — NOT a reconvergence failure)
        veto = suspect_dyn & ~genuine & ~take2
        res = res.replace(process_code=jnp.where(
            veto, jnp.int32(-4), res.process_code))
        guess = jnp.where(veto, guess0, guess)

    # --- rotation-tolerant post-blackout re-acquisition (round-5) ------
    # The veto above correctly holds the motion model through a mover
    # capture, but a blackout crossing a corner dead-reckons STRAIGHT
    # while the platform turns: by re-acquisition time the prior carries
    # tens of degrees of yaw error that the translation-widened gates
    # cannot absorb (the two reverted round-4 fixes both died here,
    # docs/accuracy/NOTES.md dynamic_s1009).  After
    # `yaw_reacquire_blackout` consecutive unhealthy frames, sweep
    # heading offsets around the prior — one widened MULLS-ICP per trial
    # yaw, best (confidence/sigma) healthy solve wins (the reference's
    # 4-DoF TLS global path, `cregistration.hpp:1584-1681`, run as a
    # bounded local sweep).  lax.cond keeps the sweep off the critical
    # path on healthy frames.
    reacq_taken = jnp.bool_(False)
    if (cfg.map.inframe_recovery_on and cfg.map.yaw_reacquire_on
            and cfg.map.initial_guess_mode == 2
            and cfg.map.yaw_reacquire_step_d > 0):
        dark = ((state.model_age >= cfg.map.yaw_reacquire_blackout)
                & ~first & ~warm & ~cadence_sel)
        need = dark & (res.process_code != 1)
        step_d = float(cfg.map.yaw_reacquire_step_d)
        n_side = max(int(round(cfg.map.yaw_reacquire_range_d / step_d)), 1)
        # trial grid: heading offsets x translation scales.  A blackout
        # can corrupt the model's SPEED as well as its heading (a slipped
        # mover capture writes its own velocity into the prior, measured
        # 2.4 m/frame vs a true 0.8 on dynamic_s1009 frame 57) — pure yaw
        # trials around a wrong-speed prior all miss the widened gates,
        # so each heading is also tried at 1x and 1/3x of the prior's
        # translation
        yaws = [np.radians(k * step_d)
                for k in range(-n_side, n_side + 1) if k != 0]
        trials = jnp.asarray([(y, s) for s in (1.0, 1.0 / 3.0)
                              for y in ([0.0] if s != 1.0 else []) + yaws],
                             jnp.float32)

        def _sweep():
            def one(trial):
                yaw, sc = trial[0], trial[1]
                z = jnp.float32(0) * yaw
                Rz = se3.make_transform(jnp.zeros(3, jnp.float32),
                                        jnp.stack([z, z, yaw]))
                init = (guess0.at[:3, 3].multiply(sc)) @ Rz
                return mm_lls_icp(frame.down, state.local_map.clouds,
                                  cfg.reg, init,
                                  max_iter=cfg.reg.reg_max_iter_num_s2m,
                                  dis_thre_add=s2m_add + jnp.float32(1.0))

            rs = jax.lax.map(one, trials)
            ok = rs.process_code == 1
            score = jnp.where(ok, rs.confidence
                              / jnp.maximum(rs.sigma, 1e-4), -1.0)
            best = jnp.argmax(score)
            return jax.tree.map(lambda a: a[best], rs)

        rec = jax.lax.cond(need, _sweep, lambda: res)
        reacq_taken = (need & (rec.process_code == 1)
                       & (rec.confidence >= 0.5 * baseline))
        res = jax.tree.map(lambda a, b: jnp.where(reacq_taken, a, b),
                           rec, res)

    failed = res.process_code < 0
    low_conf = res.confidence < cfg.map.add_length_confidence_drop * baseline
    # frame 0 registers against an EMPTY map and always "fails" — that must
    # not arm the RECOVERY gate via the failure path; but the reference
    # unconditionally widens the first real registration (i==1 gets
    # add_length=1.0, `mulls_slam.cpp:391` — no initial guess exists yet),
    # so `first` itself arms the cold-start widening for frame 1.  With the
    # s2s module on this is moot (s2m always runs widened).
    add_next = jnp.where(first | failed | low_conf | reacq_taken,
                         jnp.float32(1.0), jnp.float32(0.0))
    healthy = (res.process_code == 1) & ~first
    # baseline adaptation: fast EMA on normal healthy frames; SLOW EMA on
    # low-confidence healthy frames so a genuinely sparser environment
    # re-baselines within ~50 frames while 1-5-frame dips barely move it
    # (a frozen baseline would arm the gate + disable dynamic removal
    # forever after a dense->sparse transition)
    ema_next = jnp.where(
        healthy,
        jnp.where(ema < 0.0, res.confidence,
                  jnp.where(low_conf,
                            0.98 * ema + 0.02 * res.confidence,
                            0.9 * ema + 0.1 * res.confidence)),
        ema)
    eye = jnp.eye(4, dtype=jnp.float32)
    T_rel = jnp.where(first, eye, jnp.where(failed, guess, res.transform))
    if cfg.map.zupt_on:
        # zero-velocity update (`common_nav.cpp:6-22`)
        stationary = jnp.linalg.norm(T_rel[:3, 3]) < cfg.map.zupt_tran_thre
        T_rel = jnp.where(stationary, T_rel.at[2, 3].set(0.0), T_rel)
    # the model PERSISTS through failures (on a failed frame T_rel is the
    # prior itself, so the constant-velocity assumption carries):
    # resetting to identity was wrong physics at speed — it forced an
    # identity guess + wide gate right after a mover-induced failure,
    # which is exactly when a close mover can capture the re-acquisition
    # (dynamic world seed 1009, frame 57)
    T_prev_next = jnp.where(first, eye, T_rel)
    model_age_next = jnp.where(res.process_code == 1, jnp.int32(0),
                               state.model_age + 1)
    # a re-acquired step is (stale prior ⊕ the WHOLE blackout-accumulated
    # correction) concentrated into one frame — as the next constant-
    # velocity prior it would overshoot the remaining turn by ~n-1x.  The
    # dead-reckoning held the prior constant for n frames, so correction/n
    # approximates the per-frame turn the model missed: hand the next
    # frame `prior ⊕ correction/n` and mark the model cold (age 4: the
    # sanity veto's warm gate stays closed for one frame while the sweep
    # stays armed if re-convergence fails again).
    if cfg.map.inframe_recovery_on and cfg.map.yaw_reacquire_on \
            and cfg.map.initial_guess_mode == 2:
        n = jnp.maximum(state.model_age.astype(jnp.float32), 1.0)
        # rotation: 1/n of the correction (a dead-reckoned corner
        # accumulates yaw error over n frames, so correction/n ~ the
        # per-frame turn the model missed).  Translation: the measured
        # step in FULL — it IS the platform's current velocity; a
        # velocity-corrupted prior (mover capture) needs the whole
        # correction at once, while a short yaw blackout's accumulated
        # lateral offset stays within the widened next-frame gates.
        T_model = _fractional_step(guess0, T_rel, 1.0 / n)
        T_model = T_model.at[:3, 3].set(T_rel[:3, 3])
        T_prev_next = jnp.where(reacq_taken, T_model, T_prev_next)
        model_age_next = jnp.where(reacq_taken, jnp.int32(4),
                                   model_age_next)

    pose = state.pose @ T_rel
    pose = pose.at[:3, :3].set(se3.orthonormalize(pose[:3, :3]))

    # dynamic-object gate distance scales with per-frame motion
    # (`mulls_slam.cpp:439`)
    dyn_max = 1.5 * jnp.linalg.norm(T_rel[:3, 3])  # floored in update_local_map
    removal_ok = (~failed) & (
        res.confidence
        >= cfg.map.dynamic_removal_confidence_drop * baseline)
    code = jnp.where(first, 1, res.process_code)
    out = StepOut(T_rel=T_rel, pose=pose, sigma=res.sigma, code=code,
                  confidence=res.confidence, iterations=res.iterations,
                  vec=StepOut.pack_vec(T_rel, res.sigma, code,
                                       res.confidence, res.iterations))
    return (out, T_prev_next, add_next, ema_next, dyn_max, removal_ok,
            model_age_next)


def _gate_append(cfg: MullsConfig, out) -> jnp.ndarray:
    """Append gate for VETOED frames only (code -4: a mover-capture hold,
    where the pose is KNOWN to be the dead-reckoned guess and the
    captured geometry would ghost-fork the map).  Ordinary failures
    (-1/-2/-3) still append like the reference: their T_rel is the
    motion-model prior — approximately right — and freezing the map
    through a knife-edge corner frame starves the NEXT frame of fresh
    corner geometry, amplifying one isolated failure into a cascade
    (measured: a 7-frame corner cascade on urban_s7 when this gate
    covered all unhealthy frames)."""
    if (cfg.map.inframe_recovery_on and cfg.map.yaw_reacquire_on
            and cfg.map.initial_guess_mode == 2):
        return out.code != -4
    return jnp.bool_(True)


def _map_stage(state: SlamState, frame, T_rel, dyn_max, removal_ok,
               cfg: MullsConfig, k_map, append_ok=True):
    """Stage 3 (reference timing column 'map'): dynamic removal + local-map
    append/crop/rebudget + periodic direction-vector refresh."""
    local_map = update_local_map(state.local_map, frame, T_rel, dyn_max,
                                 cfg.map, k_map,
                                 removal_enabled=removal_ok,
                                 append_enabled=append_ok)

    # periodic re-PCA + consistency cull of the map's pillar/beam direction
    # vectors (`mulls_slam.cpp:431-435`, `map_manager.cpp:95-118`).  In the
    # single-sequence pipelines lax.cond keeps the moments pass off the
    # critical path on non-refresh frames; under the multiseq vmap the cond
    # lowers to select (both branches run every frame) — acceptable, the
    # refresh is <1% of the fused step's FLOPs vs the ICP iterations
    freq = cfg.map.local_map_recalculation_frequency
    if 0 < freq < 99999:
        from mulls_tpu.mapping.local_map import refresh_linear_map_vectors
        local_map = jax.lax.cond(
            (state.frame_idx + 1) % freq == 0,
            refresh_linear_map_vectors, lambda m: m, local_map)
    return local_map


def _undistort_frame(frame, T_rel, cfg: MullsConfig):
    """Post-registration motion compensation (`mulls_slam.cpp:704-715`,
    batched over the feature classes like `cfilter.hpp:519-549`): undistort
    the registered frame's feature clouds with the MEASURED frame-to-frame
    transform before they are appended to the map / handed to the next
    frame's scan-to-scan target."""
    if not (cfg.map.motion_compensation_method > 0
            and cfg.map.motion_compensation_timing == "post"):
        return frame
    from mulls_tpu.ops import motion

    def und(c):
        return c.replace(xyz=motion.undistort(c.xyz, c.ts_ratio, c.mask,
                                              T_rel))

    return frame.replace(down={k: und(c) for k, c in frame.down.items()},
                         full={k: und(c) for k, c in frame.full.items()})


def _slam_step_impl(state: SlamState, raw, cfg: MullsConfig):
    key, k_feat, k_map = jax.random.split(state.key, 3)
    frame, ng_rate = _feature_stage(state, raw, cfg, k_feat)
    (out, T_prev_next, add_next, ema_next, dyn_max,
     removal_ok, model_age_next) = _register_stage(state, frame, cfg)
    frame = _undistort_frame(frame, out.T_rel, cfg)
    # Unhealthy frames carry the motion-model GUESS as their pose;
    # appending their features forks the map into a ghost branch that
    # later healthy registrations lock onto (measured: 3 corner frames
    # ghost-appended during a mover encounter bent the trajectory ~15
    # deg permanently, docs/accuracy/NOTES.md dynamic_s1009).  Gating
    # the append on code==1 was net-negative in round 4 because the
    # then translation-only re-acquisition starved against the frozen
    # map — with the round-5 yaw-sweep re-acquisition the frozen map is
    # recoverable, so the gate is enabled exactly when that machinery
    # is.  (The reference appends unconditionally — it has no veto.)
    append_ok = _gate_append(cfg, out)
    local_map = _map_stage(state, frame, out.T_rel, dyn_max, removal_ok,
                           cfg, k_map, append_ok=append_ok)
    new_state = SlamState(local_map=local_map, pose=out.pose,
                          T_prev=T_prev_next,
                          frame_idx=state.frame_idx + 1, key=key,
                          prev_frame=(frame.full
                                      if _carries_prev_frame(cfg)
                                      else None),
                          nonground_rate=ng_rate,
                          add_length=add_next,
                          conf_ema=ema_next,
                          model_age=model_age_next)
    return new_state, out


slam_step = partial(jax.jit, static_argnames=("cfg",),
                    donate_argnums=(0,))(_slam_step_impl)


def staged_step_fns(cfg: MullsConfig):
    """Three separately-jitted stage programs for the per-frame 4-stage
    timing report (`--timing_report_file`, reference
    `mulls_slam.cpp:805-827` + `dataio.hpp:2041-2060`: feature / map / reg
    / loop columns).  Used only in timing mode — the production path runs
    the fused `slam_scan`.  On a tunneled accelerator each stage boundary
    pays a link round trip (the host must fetch to observe completion), so
    absolute numbers include RTT; column RATIOS remain meaningful."""

    @jax.jit
    def feat_fn(state, raw):
        key, k_feat, k_map = jax.random.split(state.key, 3)
        frame, ng_rate = _feature_stage(state, raw, cfg, k_feat)
        return frame, ng_rate, key, k_map

    @jax.jit
    def reg_fn(state, frame):
        return _register_stage(state, frame, cfg)

    @jax.jit
    def map_fn(state, frame, T_rel, dyn_max, removal_ok, k_map,
               append_ok):
        return _map_stage(state, frame, T_rel, dyn_max, removal_ok, cfg,
                          k_map, append_ok=append_ok)

    @jax.jit
    def und_fn(frame, T_rel):
        return _undistort_frame(frame, T_rel, cfg)

    def step(state, raw, timer):
        """Run one frame through the three programs; `timer(name)` is a
        context manager recording each span (host fetch inside)."""
        with timer("feature"):
            frame, ng_rate, key, k_map = feat_fn(state, raw)
            np.asarray(frame.down["ground"].xyz[0, 0])  # force completion
        with timer("reg"):
            (out, T_prev_next, add_next, ema_next, dyn_max,
             removal_ok, model_age_next) = reg_fn(state, frame)
            np.asarray(out.vec[0])
        with timer("map"):
            frame = und_fn(frame, out.T_rel)
            local_map = map_fn(state, frame, out.T_rel, dyn_max,
                               removal_ok, k_map, _gate_append(cfg, out))
            np.asarray(local_map.clouds["ground"].xyz[0, 0])
        new_state = SlamState(local_map=local_map, pose=out.pose,
                              T_prev=T_prev_next,
                              frame_idx=state.frame_idx + 1, key=key,
                              prev_frame=(frame.full
                                          if _carries_prev_frame(cfg)
                                          else None),
                              nonground_rate=ng_rate,
                              add_length=add_next,
                              conf_ema=ema_next,
                              model_age=model_age_next)
        return new_state, out

    return step


def _slam_scan_impl(state: SlamState, raws: PackedRawCloud,
                    cfg: MullsConfig):
    def body(st, raw):
        st, out = _slam_step_impl(st, raw, cfg)
        return st, out.vec

    return jax.lax.scan(body, state, raws)


slam_scan = partial(jax.jit, static_argnames=("cfg",),
                    donate_argnums=(0,))(_slam_scan_impl)
slam_scan.__doc__ = """Process a segment of K stacked packed frames in ONE
device program (`lax.scan` over the frame axis).  Amortizes per-dispatch
link latency K-fold versus per-frame dispatch and gives XLA a whole
segment to schedule; returns the carried state and the packed [K, 16]
result vectors."""

# non-donating variant for pipelined consumers that must keep a previous
# segment's state (e.g. SlamPipeline's lookahead holds the boundary local
# map for submap cloning while the next segment is already in flight);
# the extra live state is a few MB of feature tensors
slam_scan_keep = partial(jax.jit, static_argnames=("cfg",))(_slam_scan_impl)


@dataclass
class OdometryResult:
    poses: np.ndarray  # [N, 4, 4] f64, LiDAR frame, pose[0] = I
    codes: List[int] = field(default_factory=list)
    sigmas: List[float] = field(default_factory=list)
    timings: Optional[np.ndarray] = None  # [N, 4] ms (feat/map/reg/loop)


def _stack_packed(packed: List[PackedRawCloud]) -> PackedRawCloud:
    return PackedRawCloud(
        xyz_q=np.stack([p.xyz_q for p in packed]),
        intensity_q=np.stack([p.intensity_q for p in packed]),
        ts_q=(np.stack([p.ts_q for p in packed])
              if packed[0].ts_q is not None else None),
        n=np.asarray([p.n for p in packed], np.int32),
        # Semantic-KITTI labels must ride along (all-or-nothing per run)
        label=(np.stack([p.label for p in packed])
               if packed[0].label is not None else None))


def prefetch_segments(dataset, segment: int, depth: int = 2,
                      with_ts: bool = True):
    """Threaded host pipeline: decode -> pack -> stack ``segment`` frames ->
    one device_put, running ``depth`` segments ahead of the consumer so
    disk decode and H2D transfer overlap device compute (a role the
    reference's synchronous DataIo never had to play; our accelerator sits
    across a link).  Yields (k, batch) with k = frames in the batch."""
    import queue as _queue
    import threading as _threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    stop = _threading.Event()

    # native fast path: the C++ worker pool decodes AND quantizes whole
    # segments ([segment, n_raw] batches, tail repeated) — the Python
    # thread only uploads
    native_pf = (dataset.packed_segments(segment)
                 if hasattr(dataset, "packed_segments") else None)

    def worker():
        def put(item) -> bool:
            """Bounded put that honours the stop event (an abandoned
            consumer must not pin this thread in q.put forever)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        try:
            if native_pf is not None:
                with native_pf:
                    for k, batch in native_pf:
                        if stop.is_set():
                            return
                        if not put((k, jax.device_put(PackedRawCloud(
                                xyz_q=batch["xyz_q"],
                                intensity_q=batch["intensity_q"],
                                ts_q=batch["ts_q"] if with_ts else None,
                                n=batch["n"])))):
                            return
                put(None)
                return
            buf: List[PackedRawCloud] = []
            it = iter(dataset) if hasattr(dataset, "__iter__") \
                else (dataset[i] for i in range(len(dataset)))

            for frame in it:
                if stop.is_set():
                    return
                buf.append(pack_raw_host(frame, with_ts=with_ts))
                if len(buf) == segment:
                    if not put((len(buf),
                                jax.device_put(_stack_packed(buf)))):
                        return
                    buf = []
            if buf:
                # pad the tail by repeating the last frame so every dispatch
                # has the same [segment] shape (no tail recompile); the
                # consumer discards the padded outputs
                k = len(buf)
                buf = buf + [buf[-1]] * (segment - k)
                if not put((k, jax.device_put(_stack_packed(buf)))):
                    return
            put(None)
        except BaseException as e:  # surface in consumer
            while not stop.is_set():
                try:
                    q.put(e, timeout=0.2)
                    return
                except _queue.Full:
                    continue

    t = _threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class OdometryPipeline:
    """Streaming driver: segments of frames run as ONE device program
    (`slam_scan`), host pack+upload prefetch runs ahead on a thread, and
    results come back in a single device->host transfer at the end."""

    def __init__(self, cfg: MullsConfig, segment: int = 16):
        self.cfg = cfg
        self.segment = segment

    def run(self, dataset, progress: bool = False,
            profile: bool = False) -> OdometryResult:
        cfg = self.cfg
        n = len(dataset)
        state = init_state(cfg)
        vec_parts: List[jnp.ndarray] = []  # device [K,16] per segment
        timings = np.zeros((n, 4), np.float64) if profile else None

        done = 0
        ship_ts = cfg.map.motion_compensation_method == 1
        if profile:
            # 4-stage timing mode (`mulls_slam.cpp:805-827`): frames run
            # through three separately-compiled stage programs with a real
            # host fetch per stage (block_until_ready lies on tunneled
            # backends) so the feature/reg/map columns are measured, not
            # structural zeros.  Loop-closure (col 3) belongs to the
            # back-end; the plain odometry pipeline leaves it 0.
            step = staged_step_fns(cfg)
            spans: Dict[str, float] = {}

            import contextlib

            @contextlib.contextmanager
            def timer(name):
                t0 = time.perf_counter()
                yield
                spans[name] = (time.perf_counter() - t0) * 1e3

            col = {"feature": 0, "map": 1, "reg": 2}
            for i in range(n):
                raw = jax.device_put(pack_raw_host(dataset[i],
                                                   with_ts=ship_ts))
                state, out = step(state, raw, timer)
                vec_parts.append(out.vec[None])
                for name, ms in spans.items():
                    timings[i, col[name]] = ms
                done += 1
                if progress and (i + 1) % 16 == 0:
                    print(f"[{i + 1}/{n}] staged", flush=True)
        else:
            for k, batch in prefetch_segments(dataset, self.segment,
                                              with_ts=ship_ts):
                state, vecs = slam_scan(state, batch, cfg)
                vec_parts.append(vecs[:k])
                done += k
                if progress:
                    print(f"[{done}/{n}] segment dispatched", flush=True)

        jax.block_until_ready(state.pose)

        # ONE D2H for the whole run's packed outputs: on the tunneled chip
        # every device->host transfer pays a full RTT and the first one can
        # wedge the link, so a single device-side concatenate (compiled
        # once, persisted by the compilation cache) beats per-segment
        # fetches
        vecs = np.asarray(jnp.concatenate(vec_parts)) \
            if vec_parts else np.zeros((0, 16), np.float32)
        T_rels, sig, cod, _, _ = StepOut.unpack_vecs(vecs)
        codes = [int(c) for c in cod]
        sigmas = [float(s) for s in sig]
        poses = np.tile(np.eye(4), (n, 1, 1))
        for i in range(1, n):
            # re-orthonormalize in f64 to keep long compositions clean
            p = poses[i - 1] @ T_rels[i]
            u, _, vt = np.linalg.svd(p[:3, :3])
            p[:3, :3] = u @ vt
            poses[i] = p
        return OdometryResult(poses=poses, codes=codes, sigmas=sigmas,
                              timings=timings)
