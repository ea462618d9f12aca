"""Native C++ IO runtime vs the Python readers, and the packed host->device
wire format."""

import os

import numpy as np
import pytest

from mulls_tpu.io import native as nio
from mulls_tpu.io.dataset import FolderDataset, pad_cloud, read_point_cloud
from mulls_tpu.core.cloud import pack_raw_host, unpack_raw, XYZ_SCALE

DEMO = "/root/reference/demo_data/pcd"

needs_native = pytest.mark.skipif(not nio.native_available(),
                                  reason="native library not built")
needs_demo = pytest.mark.skipif(not os.path.isdir(DEMO),
                                reason="demo data unavailable")


@needs_native
@needs_demo
def test_native_pcd_matches_python():
    path = os.path.join(DEMO, "000000.pcd")
    ref = pad_cloud(read_point_cloud(path), 131072)
    out = nio.read_cloud_native(path, 131072)
    assert out is not None
    assert out["mask"].sum() == ref["mask"].sum()
    n = int(ref["mask"].sum())
    np.testing.assert_allclose(out["xyz"][:n], ref["xyz"][:n], atol=1e-6)
    np.testing.assert_allclose(out["intensity"][:n], ref["intensity"][:n],
                               atol=1e-6)


@needs_native
def test_native_bin_and_txt(tmp_path):
    pts = np.random.default_rng(0).uniform(-10, 10, (100, 4)) \
        .astype(np.float32)
    binp = tmp_path / "a.bin"
    pts.tofile(binp)
    out = nio.read_cloud_native(str(binp), 128)
    assert out["mask"].sum() == 100
    np.testing.assert_allclose(out["xyz"][:100], pts[:, :3], atol=1e-6)
    np.testing.assert_allclose(out["intensity"][:100], pts[:, 3], atol=1e-6)

    txtp = tmp_path / "a.txt"
    np.savetxt(txtp, pts, fmt="%.6f")
    out = nio.read_cloud_native(str(txtp), 128)
    assert out["mask"].sum() == 100
    np.testing.assert_allclose(out["xyz"][:100], pts[:, :3], atol=1e-4)


@needs_native
def test_native_subsample_over_capacity(tmp_path):
    pts = np.random.default_rng(1).uniform(-10, 10, (500, 4)) \
        .astype(np.float32)
    binp = tmp_path / "big.bin"
    pts.tofile(binp)
    out = nio.read_cloud_native(str(binp), 128)
    assert out["mask"].sum() == 128
    # every returned point must exist in the original cloud
    d = np.abs(out["xyz"][:128, None, :] - pts[None, :, :3]).sum(-1).min(1)
    assert d.max() < 1e-5
    # ts_ratio stays sorted (indices sorted after subsample)
    ts = out["ts_ratio"][:128]
    assert np.all(np.diff(ts) >= 0)


@needs_native
@needs_demo
def test_native_prefetcher_order():
    files = sorted(os.path.join(DEMO, f) for f in os.listdir(DEMO)
                   if f.endswith(".pcd"))[:4]
    singles = [nio.read_cloud_native(f, 131072) for f in files]
    with nio.NativePrefetcher(files, 131072, workers=3, depth=2) as pf:
        got = list(pf)
    assert len(got) == 4
    for a, b in zip(singles, got):
        np.testing.assert_allclose(a["xyz"], b["xyz"], atol=1e-6)


def test_packed_roundtrip(rng):
    n = 1000
    data = {
        "xyz": rng.uniform(-80, 80, (n, 3)).astype(np.float32),
        "intensity": rng.uniform(0, 1, n).astype(np.float32),
        "ts_ratio": rng.uniform(0, 1, n).astype(np.float32),
        "mask": np.arange(n) < 900,
    }
    # zero out the padding like pad_cloud does
    for k in ("xyz", "intensity", "ts_ratio"):
        data[k][~data["mask"]] = 0
    p = pack_raw_host(data)
    import jax
    raw = unpack_raw(jax.device_put(p))
    np.testing.assert_allclose(np.asarray(raw.xyz), data["xyz"],
                               atol=0.5 / XYZ_SCALE + 1e-6)
    np.testing.assert_allclose(np.asarray(raw.intensity), data["intensity"],
                               atol=0.5 / 255 + 1e-6)
    np.testing.assert_allclose(np.asarray(raw.ts_ratio), data["ts_ratio"],
                               atol=1.0 / 65535 + 1e-6)
    np.testing.assert_array_equal(np.asarray(raw.mask), data["mask"])


@needs_native
@needs_demo
def test_packed_segment_prefetcher_parity():
    files = sorted(os.path.join(DEMO, f) for f in os.listdir(DEMO)
                   if f.endswith(".pcd"))[:5]
    from mulls_tpu.io.native import PackedSegmentPrefetcher
    batches = []
    with PackedSegmentPrefetcher(files, 131072, segment=2) as pf:
        for k, b in pf:
            batches.append((k, b))
    assert [k for k, _ in batches] == [2, 2, 1]
    # parity with the python pack of the native single reads
    ref = pack_raw_host(nio.read_cloud_native(files[0], 131072))
    k0, b0 = batches[0]
    np.testing.assert_array_equal(b0["xyz_q"][0], ref.xyz_q)
    np.testing.assert_array_equal(b0["intensity_q"][0], ref.intensity_q)
    np.testing.assert_array_equal(b0["ts_q"][0], ref.ts_q)
    assert int(b0["n"][0]) == int(ref.n)
    # tail batch repeats the last frame
    k2, b2 = batches[2]
    assert k2 == 1
    np.testing.assert_array_equal(b2["xyz_q"][0], b2["xyz_q"][1])
