# Container recipe (parity with the reference's Dockerfile, which builds
# the C++ stack under Ubuntu + xvfb).  This framework is headless JAX:
# the same image serves CPU runs (tests, smoke) and TPU runs (install
# jax[tpu] instead at the marked line on a TPU VM).
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/mulls_tpu
COPY pyproject.toml README.md ./
COPY mulls_tpu ./mulls_tpu
COPY tests ./tests
COPY tools ./tools
COPY script ./script

# TPU VM: replace with  pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir "jax[cpu]" numpy pytest chex h5py \
    && pip install --no-cache-dir -e . \
    && make -C mulls_tpu/native CXXFLAGS="-O2 -std=c++17 -Wall -fPIC -pthread"

ENV JAX_PLATFORMS=cpu \
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# headless end-to-end smoke by default (the reference's CI entrypoint ran
# its bundled demo under xvfb; ours asserts drift on a synthetic loop)
CMD ["python", "tools/synthetic_accuracy_bench.py", "--frames", "64", \
     "--platform", "cpu", "--skip_odometry"]
