"""mulls_tpu — a TPU-native multi-metric LiDAR SLAM framework.

A ground-up re-design of the capabilities of MULLS (Pan et al., ICRA 2021,
reference C++ implementation surveyed in /root/repo/SURVEY.md) for TPU
hardware using JAX / XLA / Pallas:

* fixed-shape, masked point tensors instead of pointer-rich PCL clouds
* masked matmul neighborhood moments (MXU) instead of kd-trees
* multi-metric linear-least-squares ICP as a compiled `lax.while_loop`
* functional ring-buffer local maps instead of mutable PCL containers
* pose-graph optimization as batched Gauss-Newton with sharded edge work

Package layout:
  core/     SE(3) math, cloud pytrees, masked-tensor helpers
  io/       PCD / KITTI-bin / pose / calib readers and writers (host side)
  ops/      device kernels: voxel grid, ground filter, neighborhood PCA,
            NMS, correspondence search
  frontend/ feature extraction orchestration + MULLS-ICP
  mapping/  local feature map (functional ring buffers), submaps
  backend/  NCC matching, global registration, constraint finding, PGO
  eval/     KITTI odometry drift metrics
  parallel/ device-mesh sharding helpers (multi-chip batched registration,
            sharded PGO)
  apps/     CLI drivers (slam, reg)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Honor an explicit JAX_PLATFORMS env var even on hosts whose sitecustomize
# force-selects an accelerator plugin via jax.config (which outranks the env
# var) — otherwise "JAX_PLATFORMS=cpu" runs would silently execute on the
# tunneled TPU and serialize against other clients.
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# Persist compiled programs across processes unless the user chose a cache
# dir: a cold compile of the fused SLAM step on a remote/tunneled TPU is
# minutes, warm is seconds.  Keyed per backend so CPU and TPU artifacts
# don't collide.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # per-platform-selection tag (cpu runs and accelerator runs produce
    # different artifacts) AND per-uid (a fixed world-shared /tmp path
    # would be unwritable for the second user and a poisoning vector)
    _tag = "cpu" if (_plat or "").startswith("cpu") else "dev"
    try:
        _uid = _os.getuid()
    except Exception:
        _uid = 0
    try:
        _jax.config.update("jax_compilation_cache_dir",
                           f"/tmp/mulls_jax_cache_u{_uid}_{_tag}")
    except Exception:
        pass

# Geometry everywhere: distances, covariances and normal equations need f32
# accumulation.  TPU matmuls default to bf16 inputs, which costs ~0.4 m of
# coordinate resolution at 100 m range — unacceptable for 0.7 m neighborhoods.
# Kernels that can tolerate bf16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "float32")

from mulls_tpu.config import MullsConfig, ShapeConfig, load_flagfile

__all__ = ["MullsConfig", "ShapeConfig", "load_flagfile", "__version__"]
