"""Device-mesh sharding + multi-host helpers.

Lazy re-exports (PEP 562): `mulls_tpu.parallel.distributed` must stay
importable WITHOUT initializing the XLA backend, because
`jax.distributed.initialize` has to run before the first backend touch —
an eager `from .mesh import ...` here pulled in compiled-constant modules
and broke the multi-process path (tools/multihost_smoke.py).
"""

__all__ = ["make_mesh", "batched_icp", "distributed_slam_step"]


def __getattr__(name):
    if name in __all__:
        from mulls_tpu.parallel import mesh
        return getattr(mesh, name)
    raise AttributeError(name)
