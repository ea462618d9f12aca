from mulls_tpu.io.pcd import read_pcd, write_pcd
from mulls_tpu.io.kitti import (
    read_kitti_bin,
    read_kitti_calib,
    read_kitti_poses,
    write_kitti_poses,
    apply_calibration,
)
from mulls_tpu.io.dataset import FolderDataset, read_point_cloud

__all__ = [
    "read_pcd", "write_pcd", "read_kitti_bin", "read_kitti_calib",
    "read_kitti_poses", "write_kitti_poses", "apply_calibration",
    "FolderDataset", "read_point_cloud",
]
