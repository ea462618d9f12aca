from mulls_tpu.backend.pgo import PoseGraph, optimize_pose_graph

__all__ = ["PoseGraph", "optimize_pose_graph"]
