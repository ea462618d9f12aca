import os

import numpy as np
import pytest

from mulls_tpu.eval import kitti_metrics as km
from mulls_tpu.io import pcd as pcd_io
from mulls_tpu.io import kitti as kitti_io
from mulls_tpu.io.dataset import FolderDataset, pad_cloud

DEMO = "/root/reference/demo_data/pcd"


def test_pcd_roundtrip(tmp_path, rng):
    xyz = rng.uniform(-50, 50, (1000, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, 1000).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    pcd_io.write_pcd(p, xyz, inten)
    out = pcd_io.read_pcd(p)
    np.testing.assert_allclose(out["xyz"], xyz, atol=1e-5)
    np.testing.assert_allclose(out["intensity"], inten, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="demo data not mounted")
def test_read_demo_pcd():
    out = pcd_io.read_pcd(os.path.join(DEMO, "000000.pcd"))
    assert out["xyz"].shape[0] == 124668
    r = np.linalg.norm(out["xyz"], axis=1)
    assert np.nanmax(r) < 200.0  # plausible LiDAR ranges


def test_kitti_bin_roundtrip(tmp_path, rng):
    pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    pts.tofile(p)
    out = kitti_io.read_kitti_bin(p)
    np.testing.assert_allclose(out["xyz"], pts[:, :3])


def test_pose_io_roundtrip(tmp_path, rng):
    n = 7
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.uniform(-100, 100, (n, 3))
    p = str(tmp_path / "poses.txt")
    kitti_io.write_kitti_poses(p, poses)
    out = kitti_io.read_kitti_poses(p)
    np.testing.assert_allclose(out, poses, atol=1e-6)


def test_calibration_roundtrip(tmp_path, rng):
    calib = np.eye(4)
    calib[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    calib[:3, 3] = [0.1, -0.2, 0.3]
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, :3, 3] = rng.uniform(-5, 5, (3, 3))
    lidar = kitti_io.apply_calibration(poses, calib)
    back = kitti_io.uncalibrate(lidar, calib)
    np.testing.assert_allclose(back, poses, atol=1e-9)


def test_pad_cloud(rng):
    data = {"xyz": rng.uniform(-1, 1, (100, 3)).astype(np.float32)}
    out = pad_cloud(data, 256)
    assert out["xyz"].shape == (256, 3)
    assert out["mask"].sum() == 100
    out2 = pad_cloud({"xyz": rng.uniform(-1, 1, (300, 3)).astype(np.float32)}, 256)
    assert out2["mask"].sum() == 256


@pytest.mark.skipif(not os.path.isdir(DEMO), reason="demo data not mounted")
def test_folder_dataset():
    ds = FolderDataset(DEMO, n_raw=131072)
    assert len(ds) == 16
    frame = ds[0]
    assert frame["xyz"].shape == (131072, 3)
    assert frame["mask"].sum() == 124668


# --- KITTI drift metrics ----------------------------------------------------


def _straight_line_poses(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_metrics_zero_error():
    gt = _straight_line_poses(1500)  # 1.5 km
    errs = km.compute_error(gt, gt.copy())
    assert len(errs) > 0
    s = km.summarize(errs)
    assert s["ate_percent"] == pytest.approx(0.0, abs=1e-9)
    assert s["are_deg_per_m"] == pytest.approx(0.0, abs=1e-9)


def test_metrics_known_drift():
    """A result trajectory with a constant 1% along-track scale error must
    report ~1% ATE at every segment length."""
    gt = _straight_line_poses(1500, 1.0)
    res = _straight_line_poses(1500, 0.99)
    s = km.summarize(km.compute_error(gt, res))
    assert s["ate_percent"] == pytest.approx(1.0, rel=0.05)
    for row in s["per_length"].values():
        assert row["ate_percent"] == pytest.approx(1.0, rel=0.06)


def test_metrics_segment_windows():
    """Short trajectory yields only short-length segments; longer-mode yields
    none (parity with lastFrameFromSegmentLength semantics)."""
    gt = _straight_line_poses(150, 1.0)  # 150 m
    errs = km.compute_error(gt, gt)
    assert all(e.length == 100.0 for e in errs)
    assert km.compute_error(gt, gt, longer_segments_on=True) == []


def test_metrics_rotation_error():
    n = 1200
    gt = _straight_line_poses(n)
    res = gt.copy()
    # constant yaw-rate error of 0.01 deg/m
    yaw = np.radians(0.01) * np.arange(n)
    res[:, 0, 0] = np.cos(yaw)
    res[:, 0, 1] = -np.sin(yaw)
    res[:, 1, 0] = np.sin(yaw)
    res[:, 1, 1] = np.cos(yaw)
    s = km.summarize(km.compute_error(gt, res))
    assert s["are_deg_per_m"] == pytest.approx(0.01, rel=0.05)


def test_ate_rmse():
    gt = _straight_line_poses(10)
    res = gt.copy()
    res[:, 1, 3] += 2.0
    assert km.ate_rmse(gt, res) == pytest.approx(2.0)


def _write_test_las(path, xyz, inten, scale=0.001):
    import struct
    n = len(xyz)
    hdr = bytearray(227)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 2  # version 1.2
    struct.pack_into("<H", hdr, 94, 227)    # header size
    struct.pack_into("<I", hdr, 96, 227)    # offset to data
    hdr[104] = 0                            # point format 0
    struct.pack_into("<H", hdr, 105, 20)    # record length
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, 0.0, 0.0, 0.0)
    with open(path, "wb") as f:
        f.write(hdr)
        for p, i in zip(xyz, inten):
            rec = bytearray(20)
            struct.pack_into("<3i", rec, 0, *(np.round(p / scale)
                                              .astype(np.int64)))
            struct.pack_into("<H", rec, 12, int(i))
            f.write(rec)


def test_las_readers(tmp_path, rng):
    xyz = rng.uniform(-50, 50, (300, 3)).astype(np.float64)
    inten = rng.integers(0, 65535, 300)
    path = str(tmp_path / "t.las")
    _write_test_las(path, xyz, inten)

    from mulls_tpu.io.dataset import read_point_cloud
    d = read_point_cloud(path)
    np.testing.assert_allclose(d["xyz"], xyz, atol=2e-3)
    np.testing.assert_array_equal(d["intensity"], inten)

    from mulls_tpu.io import native as nio
    if nio.native_available():
        out = nio.read_cloud_native(path, 512)
        assert out is not None and out["mask"].sum() == 300
        np.testing.assert_allclose(out["xyz"][:300], xyz, atol=2e-3)


def test_pose_quat_roundtrip(tmp_path, rng):
    from mulls_tpu.io import kitti as kio
    n = 8
    poses = np.tile(np.eye(4), (n, 1, 1))
    ang = rng.uniform(-1, 1, n)
    poses[:, 0, 0] = np.cos(ang)
    poses[:, 0, 1] = -np.sin(ang)
    poses[:, 1, 0] = np.sin(ang)
    poses[:, 1, 1] = np.cos(ang)
    poses[:, :3, 3] = rng.uniform(-100, 100, (n, 3))
    path = str(tmp_path / "pose_quat.txt")
    kio.write_pose_quat(path, poses)
    back = kio.read_pose_quat(path)
    np.testing.assert_allclose(back, poses, atol=1e-5)


def test_hesai_h5_roundtrip(tmp_path):
    """HESAI *.h5 scan reading (`h5_io.hpp` parity): x/y/z/intensity/ts
    datasets in a [rows, cols] range-image layout."""
    h5py = pytest.importorskip("h5py")
    import numpy as np
    from mulls_tpu.io.dataset import read_point_cloud

    rng = np.random.default_rng(0)
    shape = (32, 64)
    x = rng.uniform(-50, 50, shape).astype(np.float32)
    y = rng.uniform(-50, 50, shape).astype(np.float32)
    z = rng.uniform(-3, 10, shape).astype(np.float32)
    inten = rng.uniform(0, 255, shape).astype(np.float32)
    ts = np.linspace(1e9, 1e9 + 0.1, x.size).reshape(shape)
    p = tmp_path / "scan.h5"
    with h5py.File(p, "w") as f:
        f["x"], f["y"], f["z"] = x, y, z
        f["intensity"] = inten
        f["ts"] = ts
    d = read_point_cloud(str(p))
    assert d["xyz"].shape == (x.size, 3)
    np.testing.assert_allclose(d["xyz"][:, 0], x.ravel())
    np.testing.assert_allclose(d["intensity"], inten.ravel())
    assert d["ts_ratio"].min() == 0.0 and abs(d["ts_ratio"].max() - 1.0) < 1e-6


def test_write_point_cloud_all_formats_roundtrip(tmp_path, rng):
    """`DataIo::write_cloud_file` parity (`dataio.hpp:223-874`): the
    extension-dispatching writer round-trips through our own readers for
    every supported format."""
    from mulls_tpu.io.dataset import read_point_cloud, write_point_cloud

    xyz = rng.uniform(-50, 50, (257, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, (257,)).astype(np.float32)

    for ext, atol, with_i in (("pcd", 1e-4, True), ("las", 2e-3, True),
                              ("ply", 1e-4, True), ("bin", 1e-4, True),
                              ("txt", 1e-5, False), ("csv", 1e-5, False)):
        path = str(tmp_path / f"cloud.{ext}")
        n = write_point_cloud(path, xyz, inten)
        assert n == 257
        back = read_point_cloud(path)
        assert np.allclose(back["xyz"], xyz, atol=atol), ext
        if with_i:
            assert np.allclose(back["intensity"], np.round(inten)
                               if ext == "las" else inten, atol=1.0), ext

    # subsample ratio (`dataio.hpp:846-874`) + LAS geo-shift
    # (`dataio.hpp:635-768`)
    path = str(tmp_path / "sub.las")
    n = write_point_cloud(path, xyz, inten, subsample_ratio=4,
                          geo_shift=np.asarray([1000.0, -500.0, 10.0]))
    assert n == len(xyz[::4])
    back = read_point_cloud(path)
    assert np.allclose(back["xyz"],
                       xyz[::4] + np.asarray([1000, -500, 10], np.float32),
                       atol=2e-3)
