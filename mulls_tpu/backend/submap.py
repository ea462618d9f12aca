"""Submap management + loop closure + pose-graph back-end orchestration.

Host-side re-design of the reference back-end (SURVEY.md §3.2,
`test/mulls_slam.cpp:451-628`, `src/build_pose_graph.cpp`):

* submap segmentation on accumulated translation / rotation / frame count
  (`map_manager.cpp:296-314`) — submaps snapshot the device local map
  (clouds stay as numpy pytrees on host, shipped back to device only for
  the rare loop-closure evaluations)
* adjacent edges from composed odometry, refined by map-to-map MULLS-ICP
  (`mulls_slam.cpp:477-498`)
* loop candidates by radius search over submap centers + 2D bbx IoU +
  id-gap gates (`build_pose_graph.cpp:123-209`)
* coarse alignment for non-adjacent candidates: NCC keypoint matching +
  GNC(TEASER-style)/RANSAC + odometry double-check
  (`mulls_slam.cpp:517-576`)
* PGO over submap nodes with node freezing, wrong-edge veto and cooling
  (`graph_optimizer.cpp`, `mulls_slam.cpp:597-623`)

All device work reuses the compiled mm_lls_icp / match_ncc / coarse_reg /
optimize_pose_graph programs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mulls_tpu.config import MullsConfig
from mulls_tpu.backend import coarse_reg as cr
from mulls_tpu.backend.ncc import match_ncc
from mulls_tpu.backend.pgo import (PoseGraph, optimize_pose_graph,
                                   wrong_edge_check)
from mulls_tpu.core import se3
from mulls_tpu.frontend.icp import mm_lls_icp

REG_EDGE, ADJACENT_EDGE, HISTORY_EDGE, NONE_EDGE = 2, 1, 0, -1


@dataclass
class Submap:
    sid: int
    pose: np.ndarray  # [4,4] world pose of the submap frame (f64)
    clouds: dict  # host pytree of LocalMap clouds (in submap frame)
    descriptors: dict  # host pytree of VertexDescriptors
    frame_begin: int
    frame_end: int
    center: np.ndarray = field(default=None)
    bbx_min: np.ndarray = field(default=None)
    bbx_max: np.ndarray = field(default=None)
    # pose confirmed by a successful PGO (`pose_stable`,
    # `utility.hpp:260`, set for all submaps at `mulls_slam.cpp:620-621`);
    # stable nodes get tight ceres-style bounds in later optimizations
    stable: bool = False
    # worst / mean per-frame registration confidence over this submap's
    # span — the min-vs-mean ratio de-weights the adjacent PGO edge INTO
    # this submap so corrections concentrate where the odometry actually
    # degraded (normalized per-span: absolute confidence differs between
    # dense and sparse environments)
    span_min_conf: float = 1.0
    span_mean_conf: float = 1.0

    def compute_bounds(self):
        pts = []
        for name in ("ground", "facade", "pillar"):
            c = self.clouds[name]
            m = np.asarray(c.mask)
            if m.any():
                pts.append(np.asarray(c.xyz)[m])
        if not pts:
            self.center = self.pose[:3, 3].copy()
            self.bbx_min = self.center - 1.0
            self.bbx_max = self.center + 1.0
            return
        p = np.concatenate(pts)
        pw = p @ self.pose[:3, :3].T + self.pose[:3, 3]
        self.center = self.pose[:3, 3].copy()
        self.bbx_min = pw.min(0)
        self.bbx_max = pw.max(0)


@dataclass
class Edge:
    i: int  # target submap (block1)
    j: int  # source submap (block2)
    T: np.ndarray  # [4,4] T such that T @ p_j ~ p_i
    info: np.ndarray  # [6,6]
    kind: int  # REG_EDGE / ADJACENT_EDGE / ...
    sigma: float = 0.0
    confidence: float = 1.0


def coarse_align_submaps(a: Submap, b: Submap, cfg: MullsConfig, key
                         ) -> Tuple[np.ndarray, bool]:
    """NCC keypoint matching + robust coarse registration of submap b onto
    submap a (`mulls_slam.cpp:529-556`); shared by the in-run loop closure
    and the multi-session merger (`backend/merge.py`)."""
    s = cfg.submap
    m = match_ncc(jax.device_put(a.descriptors),
                  jax.device_put(b.descriptors),
                  fixed_num_corr=s.best_n_feature_match_on,
                  corr_num=s.feature_corr_num,
                  reciprocal=s.reciprocal_feature_match_on)
    va = jax.device_put(a.clouds["vertex"])
    vb = jax.device_put(b.clouds["vertex"])
    src = vb.xyz[m.s_idx]
    tgt = va.xyz[m.t_idx]
    mask = m.valid & vb.mask[m.s_idx] & va.mask[m.t_idx]
    nb = cfg.feature.cloud_pca_neigh_r
    if s.teaser_based_global_registration_on:
        res = cr.coarse_reg_gnc(src, tgt, mask, key, noise_bound=nb,
                                min_inlier_count=s.teaser_min_inlier_count)
    else:
        res = cr.coarse_reg_ransac(src, tgt, mask, key,
                                   inlier_thre=2.0 * nb,
                                   min_inlier_count=s.teaser_min_inlier_count)
    return np.asarray(res.transform, np.float64), bool(res.valid)


def bev_stack_of(s: Submap):
    """Device-resident BEV feature stack of a submap — precompute and
    reuse when aligning many pairs (the merge fallback is all-pairs, so
    per-call rasterization would be O(A*B) instead of O(A+B))."""
    return tuple(jax.device_put(x) for x in cr.bev_feature_stack(s.clouds))


def bev_align_submaps(a: Submap, b: Submap, grid: int = 320,
                      res: float = 0.6, stack_a=None, stack_b=None
                      ) -> Tuple[np.ndarray, bool]:
    """Global BEV FFT-correlation coarse alignment of submap b onto a.

    Fallback when NCC putative sets degrade (wide loop-closure baselines
    can coherently prefer a wrong symmetric mode that passes the robust
    estimator but fails the odometry double-check); the dense
    (yaw, tx, ty) basin search cannot miss the true mode for planar
    motion.  Shared by the in-run loop closure and the multi-session
    merger (`backend/merge.py`)."""
    sx, sm_m = stack_b if stack_b is not None else bev_stack_of(b)
    tx, tm = stack_a if stack_a is not None else bev_stack_of(a)
    out = cr.coarse_reg_bev(sx, sm_m, tx, tm, grid=grid, res=res)
    return np.asarray(out.transform, np.float64), bool(out.valid)


def _bbx_iou_2d(a: Submap, b: Submap) -> float:
    lo = np.maximum(a.bbx_min[:2], b.bbx_min[:2])
    hi = np.minimum(a.bbx_max[:2], b.bbx_max[:2])
    inter = np.prod(np.maximum(hi - lo, 0.0))
    area_a = np.prod(np.maximum(a.bbx_max[:2] - a.bbx_min[:2], 1e-6))
    area_b = np.prod(np.maximum(b.bbx_max[:2] - b.bbx_min[:2], 1e-6))
    return float(inter / max(min(area_a, area_b), 1e-6))


class SlamBackend:
    """Owns submaps, the pose graph, and the loop-closure machinery."""

    def __init__(self, cfg: MullsConfig):
        self.cfg = cfg
        self.submaps: List[Submap] = []
        self.edges: List[Edge] = []
        self.events: List[str] = []  # back-end decision log (glog parity)
        self.cooling = 0
        # frames since the last successful PGO — beyond
        # num_frame_thre_large_drift the odometry prior is distrusted
        # (`mulls_slam.cpp:505,558` accu_frame_count_wo_opt)
        self.frames_wo_opt = 0
        self._accu_tran = 0.0
        self._accu_rot_deg = 0.0
        self._accu_frames = 0
        # worst per-frame registration confidence inside the open span —
        # carried onto the submap so the adjacent PGO edge can be
        # de-weighted across low-quality stretches (two internally
        # consistent submaps register confidently even when the odometry
        # BETWEEN them drifted; the m2m information alone cannot see that)
        self._span_min_conf = 1.0
        self._span_conf_sum = 0.0
        self._span_conf_n = 0
        self._reg = jax.jit(mm_lls_icp, static_argnames=("cfg", "max_iter"))
        # optimized submap poses (None until a successful PGO)
        self.optimized: Optional[np.ndarray] = None

    # --- segmentation --------------------------------------------------

    def accumulate(self, T_rel: np.ndarray, confidence: float = None
                   ) -> None:
        self._accu_tran += float(np.linalg.norm(T_rel[:3, 3]))
        c = np.clip((np.trace(T_rel[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
        self._accu_rot_deg += float(np.degrees(np.arccos(c)))
        self._accu_frames += 1
        self.frames_wo_opt += 1
        if confidence is not None:
            self._span_min_conf = min(self._span_min_conf, float(confidence))
            self._span_conf_sum += float(confidence)
            self._span_conf_n += 1

    def should_segment(self) -> bool:
        s = self.cfg.submap
        return (self._accu_tran > s.submap_accu_tran
                or self._accu_rot_deg > s.submap_accu_rot
                or self._accu_frames >= s.submap_accu_frame)

    def add_submap(self, local_map, pose: np.ndarray, frame_begin: int,
                   frame_end: int) -> Submap:
        sm = Submap(sid=len(self.submaps), pose=pose.copy(),
                    clouds=jax.device_get(local_map.clouds),
                    descriptors=jax.device_get(local_map.vertex_desc),
                    frame_begin=frame_begin, frame_end=frame_end)
        sm.compute_bounds()
        sm.span_min_conf = self._span_min_conf
        sm.span_mean_conf = (self._span_conf_sum / self._span_conf_n
                             if self._span_conf_n else 1.0)
        self.submaps.append(sm)
        self._accu_tran = 0.0
        self._accu_rot_deg = 0.0
        self._accu_frames = 0
        self._span_min_conf = 1.0
        self._span_conf_sum = 0.0
        self._span_conf_n = 0
        return sm

    # --- registration helpers -------------------------------------------

    def map_to_map(self, a: Submap, b: Submap, T_guess: np.ndarray,
                   max_iter: Optional[int] = None):
        """Register submap b onto submap a (returns RegResult)."""
        res = self._reg(jax.device_put(b.clouds), jax.device_put(a.clouds),
                        self.cfg.reg, jnp.asarray(T_guess, jnp.float32),
                        max_iter=max_iter or self.cfg.reg.reg_max_iter_num_m2m)
        return res

    def coarse_align(self, a: Submap, b: Submap, key) -> Tuple[np.ndarray, bool]:
        """NCC keypoint matching + robust coarse registration
        (`mulls_slam.cpp:529-556`)."""
        return coarse_align_submaps(a, b, self.cfg, key)

    def bev_align(self, a: Submap, b: Submap) -> Tuple[np.ndarray, bool]:
        """Global BEV-correlation coarse alignment of two submaps."""
        return bev_align_submaps(a, b)

    # --- back-end step at a new submap boundary --------------------------

    def on_new_submap(self, key) -> Optional[np.ndarray]:
        """Runs the reference's per-submap back-end (SURVEY.md §3.2).
        Returns updated submap poses [S, 4, 4] if a PGO ran and was
        accepted, else None."""
        s_cfg = self.cfg.submap
        if len(self.submaps) < 2:
            return None
        a = self.submaps[-2]
        b = self.submaps[-1]

        # demote weak registration edges (`build_pose_graph.cpp:100-121`)
        for e in self.edges:
            if e.kind == REG_EDGE and (e.confidence < 0.2 or e.sigma > 0.3):
                e.kind = HISTORY_EDGE

        # adjacent edge + map-to-map refinement
        T_adj = np.linalg.inv(a.pose) @ b.pose
        res = self.map_to_map(a, b, T_adj)
        code = int(res.process_code)
        sigma = float(res.sigma)
        if code == 1 and sigma <= s_cfg.map2map_reliable_sigma_thre:
            T_adj_ref = np.asarray(res.transform, np.float64)
            info = np.asarray(res.information, np.float64)
            # overwrite odometry with the refined estimate
            b.pose = a.pose @ T_adj_ref
            b.compute_bounds()
            T_adj = T_adj_ref
        else:
            info = np.eye(6) * (1.0 / max(sigma, 0.05) ** 2
                                if code == 1 else 100.0)
        # de-weight the adjacent edge by the span's worst-vs-mean per-frame
        # registration confidence: the two submaps are each internally
        # consistent, so the m2m information stays high even when the
        # odometry BETWEEN them degraded (corner exits, fog) — without
        # this, PGO spreads loop-closure corrections into healthy spans
        # instead of the one that actually drifted.  Normalized by the
        # span's own mean so sparse environments (uniformly low
        # confidence) keep full weight
        q = float(np.clip(
            b.span_min_conf / max(0.5 * b.span_mean_conf, 1e-6), 0.05, 1.0))
        if q < 1.0:
            self.events.append(
                f"adjacent {a.sid}->{b.sid}: span conf min/mean "
                f"{b.span_min_conf:.3f}/{b.span_mean_conf:.3f}, "
                f"info x{q*q:.4f}")
        self.edges.append(Edge(i=a.sid, j=b.sid, T=T_adj, info=info * q * q,
                               kind=ADJACENT_EDGE, sigma=sigma,
                               confidence=float(res.confidence)))

        if not s_cfg.loop_closure_detection_on:
            return None
        if self.cooling > 0:
            self.cooling -= 1
            return None

        # large-drift mode (`mulls_slam.cpp:505-511`): after too many frames
        # without a successful PGO, widen the search and drop the IoU gate
        overall = (s_cfg.overall_loop_closure_searching_on
                   and self.frames_wo_opt > s_cfg.num_frame_thre_large_drift)
        search_dist = (1.5 if overall else 1.0) * s_cfg.neighbor_search_dist
        iou_gate = 0.0 if overall else s_cfg.min_iou_thre
        if overall:
            self.events.append(
                f"submap {b.sid}: large-drift loop search "
                f"({self.frames_wo_opt} frames w/o opt)")

        # loop candidates (`build_pose_graph.cpp:123-209`)
        cands = []
        for old in self.submaps[:-1]:
            if b.sid - old.sid < s_cfg.min_submap_id_diff:
                continue
            d = np.linalg.norm(old.center[:2] - b.center[:2])
            if d > search_dist + 0.02 * self._dist_since(old):
                continue
            iou = _bbx_iou_2d(old, b)
            if iou < iou_gate:
                self.events.append(f"cand {old.sid}->{b.sid} rejected: "
                                   f"iou {iou:.2f}")
                continue
            cands.append((iou, old))
        cands.sort(key=lambda x: -x[0])
        self.events.append(f"submap {b.sid}: {len(cands)} loop candidates")

        new_reg_edges = 0
        transfer_T: Optional[np.ndarray] = None
        for rank, (iou, old) in enumerate(
                cands[:s_cfg.max_used_reg_edge_per_optimization]):
            T_guess = np.linalg.inv(old.pose) @ b.pose
            T_init = T_guess
            global_reg_ok = False
            if transfer_T is None and (iou > s_cfg.min_iou_thre_global_reg
                                       or overall):
                # global registration attempt for high-overlap candidates
                # without a reliable transform yet (`mulls_slam.cpp:529-556`);
                # on failure fall back to the odometry prediction and let the
                # fine registration's own gates decide
                T_coarse, ok = self.coarse_align(old, b, key)
                # drifted mode uses looser consistency tolerances
                # (`mulls_slam.cpp:551-555`: 10x/6x vs 3x/3x)
                f_t, f_r = (10.0, 6.0) if overall else (3.0, 3.0)

                def _checked(T_c):
                    return bool(cr.double_check_tran(
                        jnp.asarray(T_c, jnp.float32),
                        jnp.asarray(T_guess, jnp.float32),
                        s_cfg.wrong_edge_tran_thre * f_t,
                        s_cfg.wrong_edge_rot_thre_deg * f_r))

                if ok and _checked(T_coarse):
                    T_init = T_coarse
                    global_reg_ok = True
                    self.events.append(f"loop {old.sid}->{b.sid}: using "
                                       "coarse alignment")
                else:
                    # NCC matching failed or locked onto a wrong coherent
                    # mode: retry with the global BEV basin search
                    T_bev, ok_bev = self.bev_align(old, b)
                    if ok_bev and _checked(T_bev):
                        T_init = T_bev
                        global_reg_ok = True
                        self.events.append(f"loop {old.sid}->{b.sid}: "
                                           "using BEV coarse alignment")
                    else:
                        self.events.append(f"loop {old.sid}->{b.sid}: "
                                           "coarse failed, using odometry "
                                           "prediction")
            if (not global_reg_ok and transfer_T is None
                    and self.frames_wo_opt > s_cfg.num_frame_thre_large_drift):
                # large drift + no global registration: the odometry prior
                # is untrustworthy, skip the candidate (`mulls_slam.cpp:558`)
                self.events.append(f"loop {old.sid}->{b.sid}: skipped, "
                                   "drifted odometry prior only")
                continue
            res = self.map_to_map(old, b, T_init)
            if int(res.process_code) != 1:
                self.events.append(f"loop {old.sid}->{b.sid}: fine reg code "
                                   f"{int(res.process_code)}")
                continue
            if float(res.confidence) < s_cfg.map_to_map_min_cor_ratio:
                # overlap too thin for a trustworthy m2m edge
                # (`--map_to_map_min_cor_ratio`, `mulls_slam.cpp:566`)
                self.events.append(
                    f"loop {old.sid}->{b.sid}: rejected, corr ratio "
                    f"{float(res.confidence):.3f}")
                continue
            self.events.append(f"loop {old.sid}->{b.sid}: accepted, sigma "
                               f"{float(res.sigma):.4f}")
            self.edges.append(Edge(
                i=old.sid, j=b.sid, T=np.asarray(res.transform, np.float64),
                info=np.asarray(res.information, np.float64), kind=REG_EDGE,
                sigma=float(res.sigma), confidence=float(res.confidence)))
            new_reg_edges += 1
            if s_cfg.transfer_correct_reg_tran_on:
                transfer_T = np.asarray(res.transform, np.float64)
                b.pose = old.pose @ transfer_T
                b.compute_bounds()

        if new_reg_edges == 0:
            return None
        poses = self.optimize()
        if poses is not None:
            self.cooling = s_cfg.cooling_submap_num
            self.frames_wo_opt = 0
        return poses

    def _dist_since(self, old: Submap) -> float:
        return float(sum(np.linalg.norm(
            self.submaps[k + 1].pose[:3, 3] - self.submaps[k].pose[:3, 3])
            for k in range(old.sid, len(self.submaps) - 1)))

    # --- PGO --------------------------------------------------------------

    def build_graph(self, extra_fixed=None) -> PoseGraph:
        m = len(self.submaps)
        active = [e for e in self.edges if e.kind in (REG_EDGE, ADJACENT_EDGE)]
        e = len(active)
        node_t = np.stack([s.pose[:3, 3] for s in self.submaps]).astype(np.float32)
        Rs = np.stack([s.pose[:3, :3] for s in self.submaps]).astype(np.float32)
        node_q = np.asarray(se3.quat_from_rotation(jnp.asarray(Rs)))
        edge_t = np.stack([ed.T[:3, 3] for ed in active]).astype(np.float32)
        Rq = np.stack([ed.T[:3, :3] for ed in active]).astype(np.float32)
        edge_q = np.asarray(se3.quat_from_rotation(jnp.asarray(Rq)))
        w_adj = self.cfg.submap.adjacent_edge_weight_ratio
        info = np.stack([
            ed.info * (w_adj if ed.kind == ADJACENT_EDGE else 1.0)
            for ed in active]).astype(np.float32)
        fixed = np.zeros(m, bool)
        fixed[0] = True
        if extra_fixed is not None:
            # caller-pinned nodes (the multi-session merger anchors the
            # first session's entire graph)
            fixed |= np.asarray(extra_fixed, bool)
        # pre-loop nodes frozen like the reference's ceres bounds trick:
        # nodes older than the earliest reg-edge target stay fixed
        reg_targets = [ed.i for ed in active if ed.kind == REG_EDGE]
        if reg_targets:
            fixed[:min(reg_targets)] = True
        # per-node parameter bounds (`set_pgo_problem_ceres`,
        # `graph_optimizer.cpp:594-629`): PGO-confirmed ("stable") nodes
        # move at most +-inter_submap_{t,r}_limit; unconfirmed nodes get a
        # limit growing linearly with their distance from the last stable
        # node.  --free_node_on removes the bounds (`mulls_slam.cpp:191`).
        t_limit = r_limit = None
        if not self.cfg.submap.free_node_on:
            t_lim = np.full(m, np.inf, np.float32)
            r_lim = np.full(m, np.inf, np.float32)
            t0 = self.cfg.submap.inter_submap_t_limit
            r0 = self.cfg.submap.inter_submap_r_limit
            stable_index = 0
            for i in range(m):
                if fixed[i]:
                    # a frozen node anchors the growth, exactly like the
                    # reference's stable_index = min_index_for_loop
                    # (`graph_optimizer.cpp:583-588`)
                    stable_index = i
                    continue  # pinned by the freeze mask already
                if self.submaps[i].stable:
                    t_lim[i], r_lim[i] = t0, r0
                    stable_index = i
                else:
                    k = i - stable_index
                    t_lim[i], r_lim[i] = k * t0, k * r0
            # adaptive cap: no node needs to move beyond the scale of the
            # graph's actual inconsistency (the max initial edge residual
            # across ALL active edges — after a transfer-corrected loop
            # closure the conflict lives on an ADJACENT edge, so loop
            # residuals alone would under-estimate it).  On a near-
            # drift-free run the loop edges close within centimeters and
            # this pins the graph to the noise floor instead of letting
            # the span-de-weighted PGO wiggle mid-trajectory nodes by the
            # full inter_submap bounds; on a genuinely drifted run the
            # residual IS the drift and the cap does not bind.
            max_rt, max_rr = self._graph_inconsistency(active)
            cap_t = 2.0 * max_rt + 0.2
            # r_limit is a quaternion-component bound: the clamp caps the
            # rotation ANGLE at 2*r_limit (`pgo.py _clamp_to_bounds`)
            cap_r = max_rr + 0.01
            t_lim = np.minimum(t_lim, cap_t)
            r_lim = np.minimum(r_lim, cap_r)
            t_limit = jnp.asarray(t_lim)
            r_limit = jnp.asarray(r_lim)
        return PoseGraph(
            node_t=jnp.asarray(node_t), node_q=jnp.asarray(node_q),
            edge_i=jnp.asarray([ed.i for ed in active], jnp.int32),
            edge_j=jnp.asarray([ed.j for ed in active], jnp.int32),
            edge_t=jnp.asarray(edge_t), edge_q=jnp.asarray(edge_q),
            edge_info=jnp.asarray(info),
            edge_mask=jnp.ones(e, bool),
            fixed=jnp.asarray(fixed),
            t_limit=t_limit, r_limit=r_limit), active

    def _graph_inconsistency(self, active) -> Tuple[float, float]:
        """Max (translation, rotation-rad) residual of the active edges at
        the CURRENT node poses — the scale of what a PGO could correct."""
        max_rt = 0.0
        max_rr = 0.0
        for ed in active:
            Ti = self.submaps[ed.i].pose
            Tj = self.submaps[ed.j].pose
            rel = np.linalg.inv(Ti) @ Tj
            dt_ = np.linalg.norm(rel[:3, 3] - ed.T[:3, 3])
            cR = np.clip((np.trace(ed.T[:3, :3].T @ rel[:3, :3]) - 1)
                         * 0.5, -1.0, 1.0)
            max_rt = max(max_rt, float(dt_))
            max_rr = max(max_rr, float(np.arccos(cR)))
        return max_rt, max_rr

    def optimize(self, extra_fixed=None) -> Optional[np.ndarray]:
        """PGO + wrong-edge veto (`graph_optimizer.cpp:713-754`).
        On success updates submap poses and returns them [S, 4, 4]."""
        s_cfg = self.cfg.submap
        graph, active = self.build_graph(extra_fixed)

        # consistency gate: when every edge already closes within the
        # configured floor there is nothing to correct — record the check
        # as a successful (identity) optimization instead of letting a
        # bounded noise-floor solve random-walk the nodes
        max_rt, max_rr = self._graph_inconsistency(active)
        if (max_rt < s_cfg.pgo_min_inconsistency_tran
                and np.degrees(max_rr) < s_cfg.pgo_min_inconsistency_rot_deg):
            self.events.append(
                f"pgo: graph consistent (max residual {max_rt:.3f} m / "
                f"{np.degrees(max_rr):.2f} deg) — node update skipped")
            poses = np.stack([s.pose.copy() for s in self.submaps])
            # only nodes actually spanned by a loop (REG) edge earn the
            # "stable" flag here: adjacent edges are near-zero-residual by
            # construction, so an uncovered trajectory stretch is vacuously
            # consistent and must not inherit the tight post-PGO bounds
            # (`graph_optimizer.cpp:594-629` reserves those for loop-
            # corrected nodes)
            lo, hi = None, None
            for ed in active:
                if ed.kind == REG_EDGE:
                    a, b = sorted((ed.i, ed.j))
                    lo = a if lo is None else min(lo, a)
                    hi = b if hi is None else max(hi, b)
            if lo is not None:
                for s in self.submaps[lo:hi + 1]:
                    s.stable = True
            self.optimized = poses
            return poses
        # --pose_graph_optimization_method selects the solver profile of
        # the corresponding reference backend (`graph_optimizer.h:181-186`,
        # `mulls_slam.cpp:597-613`) — all three solve the same quaternion
        # BetweenFactor problem on device, differing in node handling and
        # robustification exactly like the originals:
        #   ceres  — parameter-bound node limiting + pgo_param_t options
        #            (`graph_optimizer.cpp:481-657`)
        #   g2o    — hard-fixed anchors only (no bounds trick) with Huber
        #            robust kernels on every edge (:143-384, :275-277)
        #   gtsam  — iSAM-style plain GN, no bounds, no robust kernel
        #            (:852-1040; marked not-passing upstream)
        method = s_cfg.pose_graph_optimization_method.lower()
        if method == "g2o":
            graph = graph._replace(t_limit=None, r_limit=None)
            robust = True
        elif method == "gtsam":
            graph = graph._replace(t_limit=None, r_limit=None)
            robust = False
        else:
            robust = s_cfg.robust_kernel_on
        t, q, chi2 = optimize_pose_graph(
            graph, iterations=s_cfg.pgo_max_iter,
            equal_weight=s_cfg.equal_weight_on,
            diagonal_information=s_cfg.diagonal_information_matrix_on,
            robust_kernel=robust)
        bad = np.asarray(wrong_edge_check(graph, t, q,
                                          s_cfg.wrong_edge_tran_thre,
                                          s_cfg.wrong_edge_rot_thre_deg))
        reg_idx = [k for k, ed in enumerate(active) if ed.kind == REG_EDGE]
        n_bad_reg = int(bad[reg_idx].sum()) if reg_idx else 0
        n_reg = len(reg_idx)
        for k, ed in enumerate(active):
            if bad[k] and ed.kind == REG_EDGE:
                ed.kind = NONE_EDGE
        if n_reg == 0 or n_bad_reg == n_reg or \
                (n_bad_reg / max(n_reg, 1)) > s_cfg.wrong_edge_ratio_thre:
            return None  # optimization rejected
        t = np.asarray(t, np.float64)
        R = np.asarray(se3.rotation_from_quat(jnp.asarray(q)), np.float64)
        poses = np.tile(np.eye(4), (len(self.submaps), 1, 1))
        poses[:, :3, :3] = R
        poses[:, :3, 3] = t
        for s, p in zip(self.submaps, poses):
            s.pose = p.copy()
            s.stable = True  # confirmed by PGO (`mulls_slam.cpp:620-621`)
            # keep world-frame center/bbx in sync with the corrected pose —
            # later loop-candidate gates compare them against NEW submaps
            # (`update_optimized_nodes` recomputes bbx, graph_optimizer
            # .cpp:778-798)
            s.compute_bounds()
        self.optimized = poses
        return poses
