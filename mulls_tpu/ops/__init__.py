from mulls_tpu.ops import voxel, ground, neighbors, pca, nms

__all__ = ["voxel", "ground", "neighbors", "pca", "nms"]
