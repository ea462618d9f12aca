"""Semantic-KITTI assistance path (`cfilter.hpp:2448-2608` parity)."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from mulls_tpu.core.cloud import RawCloud, pack_raw_host, unpack_raw
from mulls_tpu.core import nav
from mulls_tpu.frontend.features import extract_features


def _semantic_cfg():
    import dataclasses
    cfg = ge._small_cfg()
    return dataclasses.replace(cfg, feature=dataclasses.replace(
        cfg.feature, semantic_assist_on=True))


def test_moving_object_prefilter():
    """Runs the real check in a FRESH interpreter: compiling this
    extraction variant ~70 tests into the long-lived suite process
    segfaults inside XLA's backend_compile (reproducible at the same
    spot across three suite runs, round 5) while the identical program
    compiles and passes in a fresh process — an upstream compiler/heap
    interaction, not a program defect.  Subprocess isolation keeps the
    coverage without the crash."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env["MULLS_SEMANTIC_INNER"] = "1"
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x",
         __file__ + "::test_moving_object_prefilter_inner"],
        env=env, capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, (p.stdout or "")[-2000:] + (p.stderr or "")[-500:]


def test_moving_object_prefilter_inner(rng):
    import os
    import pytest
    if not os.environ.get("MULLS_SEMANTIC_INNER"):
        pytest.skip("runs via the subprocess wrapper above")
    cfg = _semantic_cfg()
    d = ge._synthetic_raw(cfg)
    n = cfg.shapes.n_raw
    labels = np.full(n, 40, np.int32)  # road
    moving = rng.uniform(size=n) < 0.3
    labels[moving] = 252  # moving-car
    raw = RawCloud(xyz=jnp.asarray(d["xyz"]),
                   intensity=jnp.asarray(d["intensity"]),
                   ts_ratio=jnp.asarray(d["ts_ratio"]),
                   mask=jnp.asarray(d["mask"]),
                   label=jnp.asarray(labels))
    frame = extract_features(raw, cfg, jax.random.key(0))
    # with labels: every surviving ground point must be from a static label
    g = frame.full["ground"]
    gm = np.asarray(g.mask)
    assert gm.sum() > 50
    # moving points were excluded before the ground filter: re-associate by
    # nearest raw point
    gx = np.asarray(g.xyz)[gm]
    d2 = ((gx[:, None, :2] - d["xyz"][None, :, :2]) ** 2).sum(-1)
    nearest = d2.argmin(1)
    assert not moving[nearest].any()


def test_semantic_label_roundtrip_packed(rng):
    cfg = ge._small_cfg()
    d = ge._synthetic_raw(cfg)
    d["label"] = rng.integers(0, 260, cfg.shapes.n_raw).astype(np.int32)
    p = pack_raw_host(d)
    raw = unpack_raw(jax.device_put(p))
    np.testing.assert_array_equal(np.asarray(raw.label), d["label"])


def test_nav_helpers():
    T = np.eye(4)
    T[2, 3] = 0.01
    out = nav.zupt_treatment(T, tran_thre=0.02)
    assert out[2, 3] == 0.0
    T[0, 3] = 1.0
    out = nav.zupt_treatment(T, tran_thre=0.02)
    assert out[2, 3] == 0.01  # moving: untouched

    poses = np.tile(np.eye(4), (30, 1, 1))
    poses[:, 0, 3] = np.arange(30) * 0.5  # 0.5 m / frame at 10 Hz = 5 m/s
    v = nav.estimate_velocity(poses, 29)
    assert abs(v - 5.0) < 1e-6
    t, r = nav.tran_rot_magnitude(out)
    assert abs(t - np.sqrt(1.0 + 0.01 ** 2)) < 1e-9 and r < 1e-6


def test_labels_survive_segment_stacking():
    """Regression: _stack_packed must carry Semantic-KITTI labels, or the
    pipeline silently runs without semantic assistance."""
    import jax
    import numpy as np
    from mulls_tpu.core.cloud import pack_raw_host, unpack_raw
    from mulls_tpu.pipeline.odometry import _stack_packed

    rng = np.random.default_rng(0)
    def frame():
        n = 256
        return {"xyz": rng.uniform(-10, 10, (n, 3)).astype(np.float32),
                "intensity": np.zeros(n, np.float32),
                "ts_ratio": np.zeros(n, np.float32),
                "mask": np.ones(n, bool),
                "label": rng.integers(0, 260, n).astype(np.int32)}

    packed = [pack_raw_host(frame()) for _ in range(3)]
    assert packed[0].label is not None
    batch = _stack_packed(packed)
    assert batch.label is not None and batch.label.shape == (3, 256)
    raw0 = unpack_raw(jax.tree.map(lambda x: x[0], batch))
    assert raw0.label is not None
    assert int(np.asarray(raw0.label).max()) <= 260
