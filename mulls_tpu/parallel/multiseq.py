"""Multi-sequence data-parallel odometry.

The serial frame-to-frame dependency caps single-trajectory parallelism
(SURVEY.md §7.4#6), so multi-chip throughput comes from processing MANY
trajectories at once: one SLAM state per sequence, sequences sharded over
the device mesh (`data` axis), each chip scanning its local sequences'
segments in lockstep.  This is the offline / fleet-processing mode — e.g.
all 11 KITTI odometry sequences in one run — and the analog of batch data
parallelism in the driver-template taxonomy (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mulls_tpu.config import MullsConfig
from mulls_tpu.core.cloud import PackedRawCloud, pack_raw_host
from mulls_tpu.pipeline.odometry import (OdometryResult, StepOut, init_state,
                                         _slam_step_impl)


def make_multiseq_scan(mesh: Mesh, cfg: MullsConfig, axis: str = "data"):
    """Jitted (states [S,...], raws [S,K,...]) -> (states, vecs [S,K,16])
    with sequences sharded over the mesh."""

    def seq_scan(state, raws):
        def body(st, raw):
            st, out = _slam_step_impl(st, raw, cfg)
            return st, out.vec
        return jax.lax.scan(body, state, raws)

    def stepper(states, raws):
        return jax.vmap(seq_scan)(states, raws)

    sharded = jax.shard_map(stepper, mesh=mesh,
                            in_specs=(P(axis), P(axis)),
                            out_specs=(P(axis), P(axis)),
                            check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def stack_states(states: List):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def put_sharded(tree, sharding):
    """device_put a host pytree with ``sharding`` on every leaf.  Under a
    multi-PROCESS mesh plain device_put rejects non-addressable shardings;
    each process instead materializes only its addressable shards from the
    (identical) global host value via make_array_from_callback."""
    if jax.process_count() > 1:
        def one(x):
            if jnp.issubdtype(getattr(x, "dtype", None),
                              jax.dtypes.prng_key):
                h = np.asarray(jax.random.key_data(x))
                arr = jax.make_array_from_callback(
                    h.shape, sharding, lambda idx: h[idx])
                return jax.random.wrap_key_data(
                    arr, impl=jax.random.key_impl(x))
            h = np.asarray(x)
            return jax.make_array_from_callback(
                h.shape, sharding, lambda idx: h[idx])
        return jax.tree.map(one, tree)
    return jax.device_put(tree, jax.tree.map(lambda _: sharding, tree))


class MultiSeqPipeline:
    """Runs S sequences in lockstep segments, sequences sharded over the
    mesh.  S must be a multiple of the mesh size; shorter sequences idle by
    replaying their last frame (results truncated to true length)."""

    def __init__(self, cfg: MullsConfig, mesh: Mesh, segment: int = 16):
        import dataclasses
        # under the sequence vmap, lax.cond lowers to select: the in-frame
        # recovery ladder — and the mover sanity veto's hypothesis-test
        # branch, which has its own flag since round 5 — would run their
        # extra ICPs + NN passes for EVERY sequence on EVERY frame (the
        # round-1-flagged scaling culprit).  The batch pipeline therefore
        # EXPLICITLY disables both and uses the reference's next-frame
        # add_length recovery instead; streaming users who turn off
        # `inframe_recovery_on` alone keep the veto.
        cfg = cfg.replace(map=dataclasses.replace(
            cfg.map, inframe_recovery_on=False,
            dynamic_sanity_veto_on=False))
        self.cfg = cfg
        self.mesh = mesh
        self.segment = segment
        # warm/steady split: the cold-start scan-to-scan warm-up
        # (`mulls_slam.cpp:631`) only matters inside the FIRST segment;
        # the steady program drops the branch so the vmap-select never
        # bills it (both carry prev_frame, so the state pytrees match)
        self._scan_warm = make_multiseq_scan(mesh, cfg)
        self._scan = make_multiseq_scan(mesh, cfg.replace(
            map=dataclasses.replace(cfg.map, warmup_s2s_on=False)))

    def run(self, datasets: List, progress: bool = False
            ) -> List[OdometryResult]:
        cfg = self.cfg
        S = len(datasets)
        n_dev = self.mesh.devices.size
        if S % n_dev != 0:
            raise ValueError(f"{S} sequences on {n_dev} devices: the "
                             f"sequence count must be a multiple of the "
                             f"mesh size")
        lens = [len(d) for d in datasets]
        n_max = max(lens)
        states = stack_states([init_state(cfg.replace(seed=cfg.seed + s))
                               for s in range(S)])
        sharding = NamedSharding(self.mesh, P("data"))
        states = put_sharded(states, sharding)

        # producer thread stages + uploads the NEXT segment's [S, K] batch
        # while the device runs the current one — the serial S x K
        # pack_raw_host loop was a host stall between every dispatch
        import queue as _queue
        import threading as _threading

        stop = _threading.Event()
        staged: "_queue.Queue" = _queue.Queue(maxsize=2)

        def _producer():
            last = [None] * S
            i0 = 0
            try:
                while i0 < n_max and not stop.is_set():
                    k = min(self.segment, n_max - i0)
                    batches = []
                    for s, ds in enumerate(datasets):
                        frames = []
                        for j in range(i0, i0 + k):
                            if j < lens[s]:
                                last[s] = pack_raw_host(
                                    ds[j], with_ts=cfg.map
                                    .motion_compensation_method == 1)
                            frames.append(last[s])
                        frames += [frames[-1]] * (self.segment - k)
                        batches.append(jax.tree.map(
                            lambda *xs: np.stack(xs), *frames))
                    raws = put_sharded(jax.tree.map(
                        lambda *xs: np.stack(xs), *batches), sharding)
                    staged.put((k, raws))
                    i0 += k
            except BaseException as e:  # surface in the consumer
                staged.put(e)
            staged.put(None)

        th = _threading.Thread(target=_producer, daemon=True)
        th.start()
        vec_parts = []
        i = 0
        try:
            while True:
                item = staged.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                k, raws = item
                # the warm program is needed for every segment that still
                # contains warm-up frames (frame_idx <=
                # initial_scan2scan_frame_num), not just the first — with
                # a small `segment` the warm-up window can span several
                warm_lim = self.cfg.map.initial_scan2scan_frame_num
                scan = self._scan_warm if i <= warm_lim else self._scan
                states, vecs = scan(states, raws)
                vec_parts.append(vecs[:, :k])
                i += k
                if progress:
                    print(f"[multiseq {i}/{n_max}] x{S} sequences",
                          flush=True)
        finally:
            stop.set()
            # the producer may be blocked on a full queue: drain until it
            # exits (its end-of-stream None also needs a slot)
            while th.is_alive():
                try:
                    staged.get_nowait()
                except _queue.Empty:
                    pass
                th.join(timeout=0.05)

        jax.block_until_ready(states.pose)
        # ONE D2H for the whole run (see pipeline/odometry.py).  Under a
        # multi-PROCESS mesh the concatenated result is not fully
        # addressable from any one host — allgather it first (the [S,N,16]
        # packed vecs are a few hundred KB; this is the only cross-host
        # transfer of the whole run)
        cat = jnp.concatenate(vec_parts, axis=1)  # [S, N, 16]
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            vecs = np.asarray(
                multihost_utils.process_allgather(cat, tiled=True))
        else:
            vecs = np.asarray(cat)
        results = []
        for s in range(S):
            T_rels, sig, cod, _, _ = StepOut.unpack_vecs(vecs[s, :lens[s]])
            poses = np.tile(np.eye(4), (lens[s], 1, 1))
            for t in range(1, lens[s]):
                p = poses[t - 1] @ T_rels[t]
                u, _, vt = np.linalg.svd(p[:3, :3])
                p[:3, :3] = u @ vt
                poses[t] = p
            results.append(OdometryResult(
                poses=poses, codes=[int(c) for c in cod],
                sigmas=[float(x) for x in sig]))
        return results
