"""KITTI odometry dataset IO (host side, numpy).

Formats per the reference DataIo (`dataio.hpp:357-379` .bin reader,
`:1928-2002` calib/pose loaders, `:1896-1927` pose writers):

* velodyne ``.bin``: float32 records (x, y, z, intensity)
* ``calib.txt``: line ``Tr: r11 .. t3`` — LiDAR -> left-camera transform
* pose files: one 3x4 row-major matrix (12 floats) per line, camera frame
"""

from __future__ import annotations

import numpy as np


def read_kitti_bin(path: str) -> dict:
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return {"xyz": raw[:, :3].copy(), "intensity": raw[:, 3].copy() * 255.0}


def read_kitti_labels(path: str) -> np.ndarray:
    """Semantic-KITTI .label file: lower 16 bits = semantic class id."""
    raw = np.fromfile(path, dtype=np.uint32)
    return (raw & 0xFFFF).astype(np.int32)


def read_kitti_calib(path: str) -> np.ndarray:
    """Returns the 4x4 ``Tr`` (velodyne -> camera) matrix."""
    with open(path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = [float(v) for v in line.split(":", 1)[1].split()]
                T = np.eye(4, dtype=np.float64)
                T[:3, :4] = np.asarray(vals).reshape(3, 4)
                return T
    raise ValueError(f"no 'Tr' line in {path}")


def read_kitti_poses(path: str) -> np.ndarray:
    """[N, 4, 4] float64 poses from a KITTI 12-floats-per-line file."""
    rows = np.loadtxt(path, dtype=np.float64)
    rows = np.atleast_2d(rows)
    n = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :4] = rows[:, :12].reshape(n, 3, 4)
    return poses


def write_kitti_poses(path: str, poses: np.ndarray) -> None:
    rows = np.asarray(poses)[:, :3, :4].reshape(len(poses), 12)
    np.savetxt(path, rows, fmt="%.9e")


def apply_calibration(poses_cam: np.ndarray, calib: np.ndarray) -> np.ndarray:
    """Camera-frame GT poses -> LiDAR frame: ``Tr^-1 @ P @ Tr``
    (reference semantics at `mulls_slam.cpp:301-314`)."""
    inv = np.linalg.inv(calib)
    return np.einsum("ij,njk,kl->nil", inv, poses_cam, calib)


def uncalibrate(poses_lidar: np.ndarray, calib: np.ndarray) -> np.ndarray:
    """LiDAR-frame poses -> camera frame (for leaderboard-format output)."""
    inv = np.linalg.inv(calib)
    return np.einsum("ij,njk,kl->nil", calib, poses_lidar, inv)
