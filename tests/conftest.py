"""Test environment: run everything on a virtual 8-device CPU mesh so that
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: the container exports axon
# persistent compile cache: compiles dominate test wall-clock on this host
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the 'axon' TPU backend and forces
# jax_platforms='axon,cpu' (overriding the JAX_PLATFORMS env var).  Tests
# must run on the virtual CPU mesh — and concurrent axon clients deadlock on
# the single tunneled chip — so force CPU here, before any backend init.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
