"""Multi-session submap merging (map merging across independent runs).

The reference is strictly single-session — one process, one trajectory
(`test/mulls_slam.cpp`); merging maps from several runs is named as a
target workload of this framework (BASELINE.md configs #5: "TEASER-style
certifiable global registration + multi-session submap merging").  The
building blocks are the same ones the in-run loop closure uses
(`backend/submap.py`): NCC keypoint-descriptor matching
(`cfilter.hpp:1071-1181` semantics), GNC certifiable coarse registration
(`cregistration.hpp:664-759` role), map-to-map MULLS-ICP fine edges, and
the pose-graph optimizer with wrong-edge veto (`graph_optimizer.cpp`).

Algorithm (per added session, merged into the running "anchor" graph):

1. **Global place recognition by voting.**  Every (anchor submap, new
   submap) pair gets an NCC + GNC coarse alignment attempt — no initial
   guess exists across sessions, so there is no odometry double-check to
   lean on.  Each valid pair alignment implies a session-level transform
   `T_s = pose_a @ T_pair @ pose_b^-1`; true matches agree on ONE `T_s`
   while wrong coherent modes scatter, so the largest mutually-consistent
   cluster of votes (within a translation/rotation tolerance) is the
   session alignment hypothesis — the cross-session analog of the
   reference's TEASER-vs-odometry `double_check_tran`
   (`build_pose_graph.cpp:211-235`).
2. **Fine inter-session edges.**  With the new session rigidly moved by
   `T_s`, overlapping submap pairs (center-distance + bbx-IoU gates, the
   `find_overlap_registration_constraint` gates of
   `build_pose_graph.cpp:123-209`) are registered map-to-map with
   MULLS-ICP; survivors become REGISTRATION edges.
3. **Joint PGO.**  One pose graph over all sessions' submaps — intra-
   session adjacent/loop edges plus the new inter-session edges — with
   the anchor session's nodes pinned (the merge corrects the new session
   onto the anchor, reference node-freezing semantics,
   `graph_optimizer.cpp:594-629`) and the standard wrong-edge veto.

Per-frame trajectories are corrected by redistributing each submap's
rigid correction over its frames, like the end-of-run assembly path
(`pipeline/slam.py`).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import numpy as np

from mulls_tpu.config import MullsConfig
from mulls_tpu.backend.submap import (ADJACENT_EDGE, REG_EDGE, Edge,
                                      SlamBackend, Submap, _bbx_iou_2d,
                                      bev_align_submaps,
                                      coarse_align_submaps)


@dataclass
class SessionData:
    """One finished run: its submaps + pose-graph edges (ids local to the
    session), and optionally its per-frame trajectory."""
    submaps: List[Submap]
    edges: List[Edge]
    poses: Optional[np.ndarray] = None  # [N,4,4] frame poses (session frame)
    name: str = ""


def session_from_checkpoint(path: str, name: str = "") -> SessionData:
    """Load a session from a SLAM checkpoint file
    (`pipeline/checkpoint.py`); requires the checkpoint to carry the
    back-end (i.e. the run had SLAM mode on)."""
    import pickle
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if "backend" not in payload:
        raise ValueError(f"{path}: checkpoint has no back-end (odometry-"
                         "only run?) — nothing to merge")
    b = payload["backend"]
    n = int(payload["frame_idx"])
    return SessionData(submaps=b["submaps"], edges=b["edges"],
                       poses=np.asarray(payload["poses"])[:n],
                       name=name or path)


@dataclass
class MergeResult:
    submaps: List[Submap]  # merged graph, global sids, optimized poses
    edges: List[Edge]
    # rigid transform applied to each input session (anchor = identity)
    session_transforms: List[np.ndarray]
    # [S0, S1, ...) node-id offset of each session in the merged graph
    session_offsets: List[int]
    # corrected per-frame trajectories in the anchor frame (None where the
    # input session carried no trajectory)
    poses: List[Optional[np.ndarray]]
    inter_edges: int = 0
    pgo_accepted: bool = False
    events: List[str] = field(default_factory=list)


def _rot_deg(R: np.ndarray) -> float:
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    return float(np.degrees(np.arccos(c)))


def find_session_transform(anchor: List[Submap], new: List[Submap],
                           cfg: MullsConfig, key,
                           tran_tol: float = 3.0, rot_tol_deg: float = 5.0,
                           min_votes: int = 2, events: Optional[list] = None
                           ) -> Tuple[Optional[np.ndarray], List[Tuple[int, int]]]:
    """Voting global alignment (step 1 above).  Returns (T_s, supporting
    (anchor_idx, new_idx) pairs) or (None, [])."""
    def _collect(align):
        votes = []  # (ai, bi, T_s)
        nonlocal key
        for ai, a in enumerate(anchor):
            for bi, b in enumerate(new):
                key, k = jax.random.split(key)
                T_pair, ok = align(ai, bi, a, b, k)
                if not ok:
                    continue
                T_s = a.pose @ T_pair @ np.linalg.inv(b.pose)
                votes.append((ai, bi, T_s))
        return votes

    def _best_cluster(votes):
        best: List[int] = []
        for _, _, T0 in votes:
            support = [k for k, (_, _, T) in enumerate(votes)
                       if (np.linalg.norm(T[:3, 3] - T0[:3, 3]) < tran_tol
                           and _rot_deg(T0[:3, :3].T @ T[:3, :3])
                           < rot_tol_deg)]
            if len(support) > len(best):
                best = support
        return best

    votes = _collect(
        lambda ai, bi, a, b, k: coarse_align_submaps(a, b, cfg, k))
    best_support = _best_cluster(votes)
    if events is not None:
        events.append(f"merge: NCC pass — {len(votes)} votes from "
                      f"{len(anchor)}x{len(new)} pairs, best cluster "
                      f"{len(best_support)}")
    if len(best_support) < min_votes and anchor and new:
        # descriptor matching degraded (sparse / viewpoint-hostile vertex
        # sets): dense BEV FFT-correlation basin search per pair, the same
        # fallback the in-run loop closure uses.  Stacks are rasterized
        # once per submap (O(A+B)), not once per pair (O(A*B)).
        from mulls_tpu.backend.submap import bev_stack_of
        # new-side stacks are reused by every anchor -> keep all B of them;
        # anchor stacks are used only within one inner sweep -> one-entry
        # cache bounds peak device memory at O(B + 1) rasters instead of
        # O(A + B) held across the whole all-pairs sweep
        stacks_b = [bev_stack_of(s) for s in new]
        a_cache: dict = {}

        def _stack_a(ai, a):
            if ai not in a_cache:
                a_cache.clear()
                a_cache[ai] = bev_stack_of(a)
            return a_cache[ai]

        votes = _collect(lambda ai, bi, a, b, k: bev_align_submaps(
            a, b, stack_a=_stack_a(ai, a), stack_b=stacks_b[bi]))
        best_support = _best_cluster(votes)
        if events is not None:
            events.append(f"merge: BEV fallback — {len(votes)} votes, "
                          f"best cluster {len(best_support)}")
    if len(best_support) < min_votes:
        if events is not None:
            events.append(f"merge: best cluster has {len(best_support)} "
                          f"vote(s) < {min_votes} — alignment rejected")
        return None, []
    # average the cluster: mean translation + chordal-mean rotation (SVD
    # of the summed rotation matrices)
    Ts = [votes[k][2] for k in best_support]
    t = np.mean([T[:3, 3] for T in Ts], axis=0)
    u, _, vt = np.linalg.svd(np.sum([T[:3, :3] for T in Ts], axis=0))
    R = u @ np.diag([1.0, 1.0, np.linalg.det(u @ vt)]) @ vt
    T_s = np.eye(4)
    T_s[:3, :3] = R
    T_s[:3, 3] = t
    pairs = [(votes[k][0], votes[k][1]) for k in best_support]
    if events is not None:
        events.append(f"merge: session transform from {len(pairs)} "
                      f"agreeing pairs, |t|={np.linalg.norm(t):.2f} m")
    return T_s, pairs


def merge_sessions(sessions: List[SessionData], cfg: MullsConfig,
                   key=None, min_votes: int = 2,
                   max_inter_edges_per_session: int = 8) -> MergeResult:
    """Merge ≥2 sessions into one globally-consistent submap graph.
    Sessions after the first are aligned onto the growing anchor graph in
    order; raises ValueError if a session cannot be localized."""
    if len(sessions) < 2:
        raise ValueError("need at least two sessions to merge")
    if key is None:
        key = jax.random.key(0)
    events: List[str] = []

    merged: List[Submap] = []
    edges: List[Edge] = []
    offsets: List[int] = []
    transforms: List[np.ndarray] = [np.eye(4)]
    pre_merge_poses: List[List[np.ndarray]] = []  # per session, per submap

    def _append_session(sess: SessionData, T_s: np.ndarray):
        off = len(merged)
        offsets.append(off)
        pre = []
        for sm in sess.submaps:
            sm2 = copy.deepcopy(sm)
            sm2.sid = off + sm.sid
            sm2.pose = T_s @ sm.pose
            sm2.compute_bounds()
            pre.append(sm2.pose.copy())
            merged.append(sm2)
        pre_merge_poses.append(pre)
        for e in sess.edges:
            e2 = copy.deepcopy(e)
            e2.i += off
            e2.j += off
            edges.append(e2)

    _append_session(sessions[0], np.eye(4))

    backend = SlamBackend(cfg)  # reused for m2m registration + PGO
    s_cfg = cfg.submap
    total_inter = 0

    for sess in sessions[1:]:
        key, k_align = jax.random.split(key)
        anchor_view = list(merged)
        T_s, support = find_session_transform(
            anchor_view, sess.submaps, cfg, k_align,
            min_votes=min_votes, events=events)
        if T_s is None:
            raise ValueError(
                f"session '{sess.name}' could not be localized against the "
                f"anchor map ({events[-1] if events else 'no votes'})")
        transforms.append(T_s)
        _append_session(sess, T_s)
        off = offsets[-1]

        # fine inter-session edges on overlapping pairs; voting pairs
        # first (they are known to overlap), then IoU-gated extras
        cand = list(dict.fromkeys(
            [(ai, off + bi) for ai, bi in support]
            + [(ai, off + bi)
               for ai in range(off) for bi in range(len(sess.submaps))
               if (np.linalg.norm(merged[ai].center[:2]
                                  - merged[off + bi].center[:2])
                   < s_cfg.neighbor_search_dist
                   and _bbx_iou_2d(merged[ai], merged[off + bi])
                   > s_cfg.min_iou_thre)]))
        n_ok = 0
        for attempted, (ai, bj) in enumerate(cand):
            if n_ok >= max_inter_edges_per_session:
                events.append(f"merge: inter-edge cap "
                              f"({max_inter_edges_per_session}) reached, "
                              f"{len(cand) - attempted} candidates unused")
                break
            a, b = merged[ai], merged[bj]
            T_guess = np.linalg.inv(a.pose) @ b.pose
            res = backend.map_to_map(a, b, T_guess)
            if int(res.process_code) != 1:
                events.append(f"merge edge {a.sid}->{b.sid}: fine reg code "
                              f"{int(res.process_code)}")
                continue
            if float(res.confidence) < s_cfg.map_to_map_min_cor_ratio:
                events.append(f"merge edge {a.sid}->{b.sid}: corr ratio "
                              f"{float(res.confidence):.3f} too low")
                continue
            edges.append(Edge(
                i=a.sid, j=b.sid,
                T=np.asarray(res.transform, np.float64),
                info=np.asarray(res.information, np.float64),
                kind=REG_EDGE, sigma=float(res.sigma),
                confidence=float(res.confidence)))
            n_ok += 1
            events.append(f"merge edge {a.sid}->{b.sid}: accepted, sigma "
                          f"{float(res.sigma):.4f}")
        total_inter += n_ok

    # joint PGO with the anchor session pinned
    backend.submaps = merged
    backend.edges = edges
    backend.events = events
    anchor_fixed = np.zeros(len(merged), bool)
    anchor_fixed[:offsets[1] if len(offsets) > 1 else len(merged)] = True
    # a submap's in-run "stable" status must not clamp the cross-session
    # correction: non-anchor nodes fall back to the growing free-node
    # bounds (`graph_optimizer.cpp:594-629` semantics for unconfirmed
    # nodes)
    for sm in merged[len(sessions[0].submaps):]:
        sm.stable = False
    accepted = False
    if total_inter > 0:
        poses_opt = backend.optimize(extra_fixed=anchor_fixed)
        accepted = poses_opt is not None
        events.append("merge: joint PGO "
                      + ("accepted" if accepted else "vetoed"))
    else:
        events.append("merge: no inter-session fine edges — rigid "
                      "alignment only, PGO skipped")

    # per-frame trajectory correction: frame pose -> anchor frame via T_s,
    # then the containing submap's PGO correction
    out_poses: List[Optional[np.ndarray]] = []
    for si, sess in enumerate(sessions):
        if sess.poses is None:
            out_poses.append(None)
            continue
        T_s = transforms[si]
        poses = np.einsum("ij,njk->nik", T_s, np.asarray(sess.poses))
        off = offsets[si]
        for li, sm in enumerate(sess.submaps):
            m_sm = merged[off + li]
            corr = m_sm.pose @ np.linalg.inv(pre_merge_poses[si][li])
            lo = sm.frame_begin
            hi = (sess.submaps[li + 1].frame_begin
                  if li + 1 < len(sess.submaps) else len(poses))
            poses[lo:hi] = np.einsum("ij,njk->nik", corr, poses[lo:hi])
        out_poses.append(poses)

    return MergeResult(submaps=merged, edges=edges,
                       session_transforms=transforms,
                       session_offsets=offsets, poses=out_poses,
                       inter_edges=total_inter, pgo_accepted=accepted,
                       events=events)


def merged_feature_map(result: MergeResult, max_points_per_submap: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate all submaps' feature clouds in the anchor frame.
    Returns (xyz [N,3], class_id [N] uint8, intensity [N]) for map export
    / the WebGL viewer (class ids follow `viz/html_viewer.CLASS_NAMES`)."""
    from mulls_tpu.viz.html_viewer import feature_map_points
    return feature_map_points(result.submaps, max_points_per_submap)
