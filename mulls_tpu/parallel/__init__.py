from mulls_tpu.parallel.mesh import (make_mesh, batched_icp,
                                     distributed_slam_step)

__all__ = ["make_mesh", "batched_icp", "distributed_slam_step"]
