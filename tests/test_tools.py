"""Aux tooling: format transformers, offline eval, checkpoint/resume."""

import os

import numpy as np
import pytest

from mulls_tpu.apps import eval_run, format_transform
from mulls_tpu.io import kitti as kitti_io
from mulls_tpu.io.pcd import read_pcd


def test_bin2pcd_roundtrip(tmp_path, rng):
    pts = rng.uniform(-10, 10, (200, 4)).astype(np.float32)
    binp = tmp_path / "scan.bin"
    pts.tofile(binp)
    out = tmp_path / "scan.pcd"
    format_transform.main(["bin2pcd", str(binp), str(out)])
    d = read_pcd(str(out))
    np.testing.assert_allclose(d["xyz"], pts[:, :3], atol=1e-6)
    # the KITTI reader rescales [0,1] reflectance to [0,255]
    # (`dataio.hpp:357-379` semantics)
    np.testing.assert_allclose(d["intensity"], pts[:, 3] * 255.0, rtol=1e-5)


def test_labelbin2pcd(tmp_path, rng):
    pts = rng.uniform(-10, 10, (100, 4)).astype(np.float32)
    labels = rng.integers(0, 260, 100).astype(np.uint32)
    binp = tmp_path / "scan.bin"
    labp = tmp_path / "scan.label"
    pts.tofile(binp)
    labels.astype(np.uint32).tofile(labp)
    out = tmp_path / "scan.pcd"
    format_transform.main(["labelbin2pcd", str(binp), str(labp), str(out)])
    d = read_pcd(str(out))
    np.testing.assert_array_equal(d["curvature"].astype(np.uint32),
                                  labels & 0xFFFF)


def test_eval_run_diagnosis(tmp_path):
    n = 30
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n) * 1.0
    est = gt.copy()
    est[:, 0, 3] += np.linspace(0, 0.2, n)  # mild drift
    est[10, 1, 3] += 0.5  # one bad frame
    est_f = tmp_path / "est.txt"
    gt_f = tmp_path / "gt.txt"
    kitti_io.write_kitti_poses(str(est_f), est)
    kitti_io.write_kitti_poses(str(gt_f), gt)
    errs, flagged = eval_run.adjacent_error_diagnosis(gt, est)
    assert 10 in flagged and 11 in flagged
    assert len(flagged) <= 4
    out = tmp_path / "eval.json"
    eval_run.main(["--est_pose_file", str(est_f), "--gt_pose_file",
                   str(gt_f), "--json_out", str(out)])
    assert out.exists()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from mulls_tpu.pipeline import checkpoint as ck

    state = {"a": jnp.arange(5), "b": (jnp.eye(3), jnp.float32(2.0))}
    path = str(tmp_path / "run.ckpt")
    poses = np.tile(np.eye(4), (4, 1, 1))
    ck.save_checkpoint(path, state, 3, poses, poses, [1, 1, 1], [0.1] * 3)
    payload = ck.load_checkpoint(path)
    assert payload["frame_idx"] == 3
    np.testing.assert_array_equal(np.asarray(payload["state"]["a"]),
                                  np.arange(5))
    np.testing.assert_allclose(np.asarray(payload["state"]["b"][0]),
                               np.eye(3))
    assert payload["codes"] == [1, 1, 1]
    assert ck.load_checkpoint(str(tmp_path / "missing.ckpt")) is None


def test_cli_flag_overrides():
    """gflags parity: --name=value on the command line overrides the
    flagfile (`test/mulls_slam.cpp:203` ParseCommandLineFlags)."""
    from mulls_tpu.config import MullsConfig, apply_flag_overrides
    cfg = MullsConfig()
    out = apply_flag_overrides(cfg, ["--vertical_ang_calib_on=true",
                                     "--vertical_ang_correction_deg=0.195",
                                     "--some_unknown_flag=1"])
    assert out.preprocess.vertical_ang_calib_on is True
    assert abs(out.preprocess.vertical_ang_correction_deg - 0.195) < 1e-9
    # unknown flags are warned about, not fatal


def test_checkpoint_backend_span_fields(tmp_path):
    """Resume must not lose the open span's registration-quality
    accumulators — a fresh backend would give the next submap's adjacent
    PGO edge full weight even when the pre-crash half of the span was
    degraded (docs/ACCURACY.md span-weighted PGO)."""
    import jax.numpy as jnp
    from mulls_tpu.config import MullsConfig
    from mulls_tpu.backend.submap import SlamBackend
    from mulls_tpu.pipeline import checkpoint as ck

    cfg = MullsConfig()
    be = SlamBackend(cfg)
    T = np.eye(4); T[0, 3] = 0.8
    be.accumulate(T, confidence=0.45)
    be.accumulate(T, confidence=0.04)  # degraded frame
    be.frames_wo_opt = 7

    path = str(tmp_path / "run.ckpt")
    poses = np.tile(np.eye(4), (2, 1, 1))
    ck.save_checkpoint(path, {"x": jnp.zeros(2)}, 2, poses, poses,
                       [1, 1], [0.1, 0.1], backend=be)

    be2 = SlamBackend(cfg)
    ck.load_checkpoint(path, backend=be2)
    assert abs(be2._span_min_conf - 0.04) < 1e-9
    assert abs(be2._span_conf_sum - 0.49) < 1e-9
    assert be2._span_conf_n == 2
    assert be2.frames_wo_opt == 7
    # older checkpoints without the span key restore cleanly too
    import pickle
    with open(path, "rb") as f:
        payload = pickle.load(f)
    del payload["backend"]["span"]
    del payload["backend"]["frames_wo_opt"]
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    be3 = SlamBackend(cfg)
    assert ck.load_checkpoint(path, backend=be3) is not None
    assert be3._span_min_conf == 1.0


def test_bench_prints_json_on_warmup_failure(tmp_path):
    """Kill-test (round-3 hardening): a backend error at the bench's
    warm-up fetch must still yield exactly one parseable JSON line with a
    warn field and rc 0 — BENCH_r02 died here with zero output."""
    import json
    import subprocess
    import sys

    driver = tmp_path / "driver.py"
    driver.write_text(
        "import mulls_tpu.pipeline.odometry as od\n"
        "def boom(*a, **k):\n"
        "    raise RuntimeError('injected warmup failure')\n"
        "od.slam_scan = boom\n"
        "import bench\n"
        "bench.WARMUP_BUDGET = 60.0\n"
        "bench.main()\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    p = subprocess.run([sys.executable, str(driver)], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=280)
    assert p.returncode == 0, p.stderr[-2000:]
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "frontend_odometry_fps"
    assert "warn_warmup" in out
