"""Mid-run checkpoint / resume.

The reference has none (SURVEY.md §5.4 — it only appends poses to disk
every frame, leaving a usable trajectory prefix after a crash).  Pod-scale
runs need real resumability, so a checkpoint captures the whole session:
the on-device SLAM state (local map + pose + motion model + RNG), the
host back-end (submaps, pose-graph edges, cooling counters), and the
trajectory so far.  Format: one pickle of numpy pytrees (no live device
buffers), written atomically.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state, frame_idx: int, poses: np.ndarray,
                    poses_odom: np.ndarray, codes, sigmas,
                    backend=None) -> None:
    payload = {
        "version": 1,
        "frame_idx": int(frame_idx),
        "state": jax.device_get(state),
        "poses": np.asarray(poses),
        "poses_odom": np.asarray(poses_odom),
        "codes": list(codes),
        "sigmas": list(sigmas),
    }
    if backend is not None:
        payload["backend"] = {
            "submaps": backend.submaps,
            "edges": backend.edges,
            "events": backend.events,
            "cooling": backend.cooling,
            "accu": (backend._accu_tran, backend._accu_rot_deg,
                     backend._accu_frames),
            # open-span registration-quality accumulators — losing them on
            # resume would give the next submap's adjacent PGO edge full
            # weight even if the pre-crash half of the span was degraded
            "span": (backend._span_min_conf, backend._span_conf_sum,
                     backend._span_conf_n),
            "frames_wo_opt": backend.frames_wo_opt,
            "optimized": backend.optimized,
        }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)  # atomic
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, backend=None, cfg=None) -> Optional[dict]:
    """Returns the payload with `state` re-uploaded to device, or None.
    If ``backend`` is given, its host state is restored in place.
    ``cfg`` (optional) reconciles the prev_frame carry against the
    current config's structure (round-4 changed it from down- to
    full-capacity clouds; a mismatched carry only costs the warm-up
    behavior on the first post-resume frames)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = payload["state"]
    if cfg is not None and hasattr(state, "prev_frame"):
        from mulls_tpu.pipeline.odometry import init_state
        fresh_prev = init_state(cfg).prev_frame
        old_prev = getattr(state, "prev_frame", None)

        def _shape_of(p):
            return (None if p is None
                    else {k: v.xyz.shape for k, v in p.items()})

        if _shape_of(old_prev) != _shape_of(fresh_prev):
            object.__setattr__(state, "prev_frame", fresh_prev)
    # forward-compat: checkpoints written before SlamState gained a field
    # unpickle without it (frozen-dataclass pickling restores __dict__
    # verbatim); backfill scalar defaults.  (States saved as plain pytrees
    # — e.g. dicts in tests — pass through untouched.)
    if hasattr(state, "nonground_rate"):
        import jax.numpy as jnp
        for name, default in (("add_length", jnp.float32(0.0)),
                              ("conf_ema", jnp.float32(-1.0)),
                              ("model_age", jnp.int32(99))):
            if getattr(state, name, None) is None:
                object.__setattr__(state, name, default)
    payload["state"] = jax.device_put(state)
    if backend is not None and "backend" in payload:
        b = payload["backend"]
        backend.submaps = b["submaps"]
        backend.edges = b["edges"]
        backend.events = b["events"]
        backend.cooling = b["cooling"]
        (backend._accu_tran, backend._accu_rot_deg,
         backend._accu_frames) = b["accu"]
        if "span" in b:  # older checkpoints predate the span accumulators
            (backend._span_min_conf, backend._span_conf_sum,
             backend._span_conf_n) = b["span"]
        backend.frames_wo_opt = b.get("frames_wo_opt",
                                      backend.frames_wo_opt)
        backend.optimized = b["optimized"]
        # the device submap bank is never serialized; re-upload the
        # restored clouds so the post-resume loop ladder runs the same
        # banked batch path as the original session (backend.rebuild_bank
        # docstring has the measured divergence without this)
        if hasattr(backend, "rebuild_bank"):
            backend.rebuild_bank()
    return payload
