"""Full SLAM pipeline: front-end odometry + submap back-end (loop closure,
PGO) — the complete `mulls_slam` driver (SURVEY.md §3.1-3.2).

Structure: the front-end is the fused device `slam_step` (see
`pipeline/odometry.py`); the host orchestrates in *segments* of a few
frames — it enqueues a segment asynchronously, then syncs once to read the
segment's relative transforms and run back-end bookkeeping (submap
segmentation, loop closure, PGO).  Segment-sized sync keeps the device
pipeline busy while bounding the staleness of back-end decisions to the
segment length (deviation from the reference, which triggers submaps at
exact frame boundaries).
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mulls_tpu.config import MullsConfig
from mulls_tpu.backend.submap import SlamBackend
from mulls_tpu.core.cloud import PackedRawCloud, pack_raw_host
from mulls_tpu.pipeline.odometry import (OdometryResult, RawCloud, SlamState,
                                         StepOut, _stack_packed, init_state,
                                         slam_scan, slam_step)


class SlamPipeline:
    def __init__(self, cfg: MullsConfig, segment: int = 8,
                 checkpoint_path: Optional[str] = None,
                 checkpoint_every: int = 8,
                 snapshot_dir: Optional[str] = None,
                 snapshot_every: int = 4):
        self.cfg = cfg
        self.segment = segment
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every  # in segments
        # during-run observability (the reference's live MapViewer role):
        # every `snapshot_every` submaps a WebGL + BEV artifact of the
        # current map/trajectory/edges is written on a background thread
        self.snapshot_dir = snapshot_dir
        self.snapshot_every = snapshot_every
        self._key = jax.random.key(cfg.seed + 1)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _to_raw(self, frame: dict) -> PackedRawCloud:
        # device_put the WHOLE pytree: rebuilding field-by-field once
        # dropped the label plane (silently disabling semantic assist)
        return jax.device_put(pack_raw_host(
            frame,
            with_ts=self.cfg.map.motion_compensation_method == 1))

    def run(self, dataset, progress: bool = False,
            stage_timing: bool = False) -> OdometryResult:
        cfg = self.cfg
        n = len(dataset)
        state = init_state(cfg)
        backend = SlamBackend(cfg)
        staged = None
        spans = {}
        if stage_timing:
            # 4-stage per-frame timing (`mulls_slam.cpp:805-827`): stage-
            # split programs with real host fetches; cols = feature/map/
            # reg and the host back-end fills loop below
            from mulls_tpu.pipeline.odometry import staged_step_fns
            import contextlib

            @contextlib.contextmanager
            def _timer(name):
                t0 = time.perf_counter()
                yield
                spans[name] = (time.perf_counter() - t0) * 1e3

            staged = (staged_step_fns(cfg), _timer)

        poses = np.tile(np.eye(4), (n, 1, 1))
        poses_odom = np.tile(np.eye(4), (n, 1, 1))  # pure odometry chain
        codes: List[int] = []
        sigmas: List[float] = []
        frame_submap = np.full(n, -1, np.int32)  # submap id per frame
        submap_open_begin = 0
        cur_pose = np.eye(4)
        cur_pose_odom = np.eye(4)
        timings = np.zeros((n, 4), np.float64)

        # resume from a checkpoint if one exists (SURVEY.md §5.4)
        i = 0
        seg_count = 0
        if self.checkpoint_path:
            from mulls_tpu.pipeline.checkpoint import load_checkpoint
            ck = load_checkpoint(self.checkpoint_path, backend=backend,
                                 cfg=cfg)
            if ck is not None and 0 < ck["frame_idx"] <= n:
                state = ck["state"]
                i = ck["frame_idx"]
                m = min(i, len(ck["poses"]))
                poses[:m] = ck["poses"][:m]
                poses_odom[:m] = ck["poses_odom"][:m]
                codes = list(ck["codes"])[:m]
                sigmas = list(ck["sigmas"])[:m]
                cur_pose = poses[i - 1].copy()
                cur_pose_odom = poses_odom[i - 1].copy()
                submap_open_begin = (backend.submaps[-1].frame_end + 1
                                     if backend.submaps else 0)
                for s in backend.submaps:
                    frame_submap[s.frame_begin:s.frame_end + 1] = s.sid
                print(f"[mulls_tpu] resumed at frame {i} "
                      f"({len(backend.submaps)} submaps)")

        def _boundary_start(lmap, seg_end):
            """Synchronous part of the submap boundary: snapshot the local
            map into the bank (one async dispatch) + span bookkeeping.
            Also snapshots the drift counter (`frames_wo_opt`) so the
            ladder's large-drift gates read a value fixed at THIS frame
            index, not whatever the worker has accumulated by the time the
            boundary thread gets scheduled."""
            nonlocal submap_open_begin
            last = seg_end - 1
            sm = backend.add_submap(lmap, poses[last],
                                    submap_open_begin, last)
            frame_submap[submap_open_begin:seg_end] = sm.sid
            submap_open_begin = seg_end
            old_poses = np.stack([s.pose for s in backend.submaps])
            return sm, old_poses, backend.frames_wo_opt

        def _boundary_finish(old_poses, b_end, frames_wo_opt):
            """The expensive boundary ladder (`mulls_slam.cpp:451-628`):
            adjacent m2m + loop candidates + PGO.  Runs on the boundary
            thread; returns a correction record for _apply_boundary."""
            new_poses = backend.on_new_submap(self._next_key(),
                                              frames_wo_opt=frames_wo_opt)
            if new_poses is not None:
                # per-submap rigid corrections against old_poses (the
                # poses the stored frames were chained from, captured
                # BEFORE on_new_submap) — any in-call m2m/transfer nudge
                # of the newest submap is already folded into new_poses
                corr = np.stack([newp @ np.linalg.inv(old_poses[s.sid])
                                 for s, newp in zip(backend.submaps,
                                                    new_poses)])
                return ("pgo", b_end, corr)
            # no PGO: the adjacent-edge m2m refinement may still have
            # nudged the newest submap pose (`mulls_slam.cpp:489-498`)
            return ("nudge", b_end, backend.submaps[-1].pose.copy())

        def _apply_boundary(res, now_end):
            """Fold a finished boundary's corrections into the trajectory.
            Frames chained AFTER the boundary (while its ladder ran on the
            boundary thread) composed from the uncorrected tail pose, so
            the newest submap's correction applies to them too — the
            reference applies PGO results with exactly this kind of lag
            (`mulls_slam.cpp:614-623`)."""
            nonlocal cur_pose
            kind, b_end, data = res
            if kind == "pgo":
                # the drift counter resets at the ACCEPTED boundary, so
                # only the frames chained after it count as un-optimized
                # (the in-ladder reset raced with the worker's increments)
                backend.frames_wo_opt = max(now_end - b_end, 0)
                for sid in range(len(data)):
                    mask = frame_submap[:b_end] == sid
                    if not mask.any():
                        continue
                    poses[:b_end][mask] = np.einsum(
                        "ij,njk->nik", data[sid], poses[:b_end][mask])
                tail_corr = data[-1]
                if now_end > b_end:
                    poses[b_end:now_end] = np.einsum(
                        "ij,njk->nik", tail_corr, poses[b_end:now_end])
                cur_pose = tail_corr @ cur_pose
            else:
                last = b_end - 1
                ref_pose = data
                if not np.allclose(ref_pose, poses[last]):
                    corr = ref_pose @ np.linalg.inv(poses[last])
                    poses[last:now_end] = np.einsum(
                        "ij,njk->nik", corr, poses[last:now_end])
                    cur_pose = corr @ cur_pose

        def _boundary(lmap, seg_end):
            """Synchronous full boundary (staged path + end-of-run flush)."""
            sm, old_poses, fwo = _boundary_start(lmap, seg_end)
            _apply_boundary(_boundary_finish(old_poses, seg_end, fwo),
                            seg_end)
            return sm

        def _process(entry):
            """Host bookkeeping + back-end for ONE completed segment
            (fetch of its packed vecs happens here — one lookahead behind
            the dispatches so the D2H wait overlaps the next segment's
            device compute; there is no host->device feedback, corrections
            live on the host pose array)."""
            nonlocal cur_pose, cur_pose_odom, submap_open_begin, pending
            i0, k_real, vecs_dev, lmap = entry
            seg_end = i0 + k_real
            t0 = time.perf_counter()
            vecs_np = np.asarray(vecs_dev[:k_real])  # true completion wait
            timings[i0:seg_end, 2] = (time.perf_counter() - t0) * 1e3 \
                / k_real
            # NOTE (round 4): an in-flight boundary ladder is folded ONLY
            # at the next boundary / checkpoint / end of run — a strict
            # one-boundary lag like the reference's deterministic PGO
            # application (`mulls_slam.cpp:614-623`).  Round 3 folded it
            # opportunistically (`if pending.done()`), which made how many
            # frames chain before a correction lands — and therefore the
            # whole trajectory — depend on thread timing (BENCH_r03's
            # 2.088 m vs the session's 0.125 m on the same seed).
            T_rels, seg_sigma, seg_codes, seg_conf, _ = StepOut.unpack_vecs(
                vecs_np)

            for k in range(i0, seg_end):
                T = T_rels[k - i0]
                u, _, vt = np.linalg.svd(T[:3, :3])
                T[:3, :3] = u @ vt
                if k > 0:
                    cur_pose = cur_pose @ T
                    cur_pose_odom = cur_pose_odom @ T
                poses[k] = cur_pose
                poses_odom[k] = cur_pose_odom
                codes.append(int(seg_codes[k - i0]))
                sigmas.append(float(seg_sigma[k - i0]))
                if k > 0:
                    backend.accumulate(T, confidence=seg_conf[k - i0])

            # back-end at segment boundary (`mulls_slam.cpp:451-628`).
            # The expensive ladder runs on the boundary thread so the
            # segment worker keeps draining vecs fetches meanwhile; the
            # NEXT boundary waits for it (strict back-end ordering)
            tb0 = time.perf_counter()
            if backend.should_segment():
                if pending is not None:
                    # deterministic one-boundary lag: block for the
                    # previous ladder here, whether or not it finished
                    _apply_boundary(pending.result(), seg_end)
                    pending = None
                sm, old_poses, fwo = _boundary_start(lmap, seg_end)
                if boundary_pool is not None:
                    pending = boundary_pool.submit(_boundary_finish,
                                                   old_poses, seg_end, fwo)
                else:
                    _apply_boundary(
                        _boundary_finish(old_poses, seg_end, fwo), seg_end)
                if (self.snapshot_dir
                        and sm.sid % max(self.snapshot_every, 1) == 0):
                    import os
                    import threading
                    from mulls_tpu.viz.html_viewer import write_run_snapshot
                    os.makedirs(self.snapshot_dir, exist_ok=True)
                    base = os.path.join(self.snapshot_dir,
                                        f"snapshot_{sm.sid:04d}")
                    subs = list(backend.submaps)
                    # viewer edges index into the trajectory: map submap
                    # ids to their last frame
                    fe = {s.sid: s.frame_end for s in subs}
                    eds = [(fe[e.i], fe[e.j], e.kind)
                           for e in backend.edges
                           if e.i in fe and e.j in fe]
                    traj = poses[:seg_end, :3, 3].copy()
                    threading.Thread(
                        target=write_run_snapshot,
                        args=(base, subs, traj, eds), daemon=True).start()
            timings[i0:seg_end, 3] = (time.perf_counter() - tb0) * 1e3 \
                / k_real
            if progress:
                print(f"[{seg_end}/{n}] submaps={len(backend.submaps)} "
                      f"edges={len(backend.edges)} "
                      f"sigma={sigmas[-1]:.4f}", flush=True)

        # in-flight boundary ladder (a Future) + its executor; the staged
        # path keeps boundaries synchronous (boundary_pool stays None)
        pending = None
        boundary_pool = None

        def _drain_pending(now_end):
            nonlocal pending
            if pending is not None:
                _apply_boundary(pending.result(), now_end)
                pending = None

        if staged is not None:
            while i < n:
                seg_end = min(i + self.segment, n)
                step, _timer = staged
                vec_rows = []
                for k in range(i, seg_end):
                    raw = jax.device_put(pack_raw_host(dataset[k]))
                    state, out = step(state, raw, _timer)
                    vec_rows.append(np.asarray(out.vec))
                    timings[k, 0] = spans.get("feature", 0.0)
                    timings[k, 1] = spans.get("map", 0.0)
                    timings[k, 2] = spans.get("reg", 0.0)
                k_real = seg_end - i
                reg_spans = timings[i:seg_end, 2].copy()
                _process((i, k_real, jnp.stack(vec_rows), state.local_map))
                # _process measures its own fetch wait into col 2; the
                # staged per-frame reg spans are the honest values
                timings[i:seg_end, 2] = reg_spans
                i = seg_end
                seg_count += 1
        else:
            import queue as _queue
            import threading as _threading
            from mulls_tpu.pipeline.odometry import (prefetch_segments,
                                                     slam_scan_keep)

            class _View:
                """Dataset slice view for resume offsets."""

                def __init__(self, ds, start):
                    self.ds, self.start = ds, start

                def __len__(self):
                    return len(self.ds) - self.start

                def __getitem__(self, k):
                    return self.ds[self.start + k]

            # round-3 overlap: ALL segment post-processing (the blocking
            # D2H fetch of the segment vecs, pose chaining, and the whole
            # submap back-end — bank store, loop-candidate ladder, PGO)
            # runs on ONE worker thread consuming segments in order, so
            # the main thread never stops dispatching front-end segments.
            # The back-end has no same-frame feedback into the front-end
            # (corrections live on the host pose array; the reference
            # applies PGO results with a lag too, `mulls_slam.cpp:
            # 614-623`), so processing a segment 1-4 segments late only
            # delays bookkeeping, never changes device inputs.  All
            # mutable run state (poses, codes, backend) is worker-
            # confined; the bounded queue gives backpressure.
            jobs: "_queue.Queue" = _queue.Queue(maxsize=4)
            w_err: List[BaseException] = []
            # boundary ladders run on their own thread so the segment
            # worker keeps draining fetches during loop-closure work
            from concurrent.futures import ThreadPoolExecutor
            boundary_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mulls-boundary")

            def _worker():
                while True:
                    item = jobs.get()
                    try:
                        if item is not None and not w_err:
                            _process(item)
                    except BaseException as e:  # surface in main thread
                        w_err.append(e)
                    finally:
                        jobs.task_done()
                    if item is None:
                        return

            th = _threading.Thread(target=_worker, daemon=True)
            th.start()

            ship_ts = cfg.map.motion_compensation_method == 1
            try:
                for k, batch in prefetch_segments(_View(dataset, i),
                                                  self.segment,
                                                  with_ts=ship_ts):
                    # non-donating scan: the queued entry keeps the
                    # boundary local map alive while later segments run
                    state, vecs = slam_scan_keep(state, batch, cfg)
                    jobs.put((i, k, vecs, state.local_map))
                    i += k
                    seg_count += 1
                    if w_err:
                        break
                    if self.checkpoint_path and \
                            seg_count % self.checkpoint_every == 0:
                        jobs.join()  # drain: checkpoint must match i
                        if w_err:
                            break
                        _drain_pending(i)  # corrections must be folded in
                        from mulls_tpu.pipeline.checkpoint import \
                            save_checkpoint
                        save_checkpoint(self.checkpoint_path, state, i,
                                        poses, poses_odom, codes, sigmas,
                                        backend)
            finally:
                jobs.put(None)
                th.join()
                try:
                    _drain_pending(i)
                finally:
                    boundary_pool.shutdown(wait=True)
            if w_err:
                raise w_err[0]

        # end-of-run flush of the open span as a final (partial) submap.
        # The reference leaves the tail frames outside any submap and
        # recovers them in its end-of-run post-processing
        # (`mulls_slam.cpp:823-876`: final frame push + framewise/inner
        # PGO); here the flush runs the regular boundary ladder once more
        # so a revisit inside the last open span still earns its loop edge
        if backend.submaps and backend._accu_frames > 0 and i > 0:
            _boundary(state.local_map, i)

        if self.checkpoint_path:
            # final checkpoint: the completed session is the input artifact
            # for multi-session merging (`backend/merge.py`)
            from mulls_tpu.pipeline.checkpoint import save_checkpoint
            save_checkpoint(self.checkpoint_path, state, n, poses,
                            poses_odom, codes, sigmas, backend)

        res = OdometryResult(poses=poses, codes=codes, sigmas=sigmas,
                             timings=timings)
        res.backend = backend
        res.poses_odom = poses_odom
        res.frame_submap = frame_submap
        return res

    def refine(self, res: OdometryResult) -> np.ndarray:
        """End-of-run refinement, reference method dispatch:
        --framewise_pgo_on (method 1, `mulls_slam.cpp:835-875`) optimizes
        ONE graph over ALL frame nodes — adjacent odometry edges plus the
        submap loop-closure edges remapped to their submaps' last frames —
        via the matrix-free CG solver; otherwise (method 2,
        `mulls_slam.cpp:876-927`) the inner-submap pass redistributes the
        back-end's corrections over each submap's interior frames.
        Returns (and stores) the refined poses."""
        from mulls_tpu.backend.refine import inner_submap_refine
        backend = getattr(res, "backend", None)
        if backend is None or len(backend.submaps) < 1:
            return res.poses
        if self.cfg.submap.framewise_pgo_on:
            from mulls_tpu.backend.refine import framewise_pgo
            from mulls_tpu.backend.submap import REG_EDGE
            # REG edges act between the submaps' last frames
            # (`mulls_slam.cpp:856-864` last_frame_index remap)
            fe = {s.sid: s.frame_end for s in backend.submaps}
            reg = [(fe[e.i], fe[e.j], e.T, e.info)
                   for e in backend.edges if e.kind == REG_EDGE
                   and e.i in fe and e.j in fe]
            if reg:
                res.poses = framewise_pgo(
                    getattr(res, "poses_odom", res.poses), reg,
                    iterations=self.cfg.submap.pgo_max_iter)
                return res.poses
            # no loop edges: fall through to the inner-submap pass
            # (the reference keeps pose_init on failure, :869-871)
        bounds = [(s.frame_begin, s.frame_end) for s in backend.submaps]
        res.poses = inner_submap_refine(
            res.poses, res.poses_odom, bounds,
            iterations=self.cfg.submap.inner_refine_max_iter,
            t_limit=self.cfg.submap.inner_submap_t_limit,
            r_limit=self.cfg.submap.inner_submap_r_limit)
        return res.poses
