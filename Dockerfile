# Deployment image (reference Dockerfile:1-14 built on pytorch/pytorch +
# catkin; here a lean JAX/TPU image — the native trajgen builds from
# source with g++, no catkin/nlopt).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY ipp_rl_tpu ./ipp_rl_tpu
COPY main.py bench.py ./
COPY scripts ./scripts

# for TPU hosts substitute: pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir "jax[cpu]" flax optax chex pyyaml matplotlib && \
    pip install --no-cache-dir -e .

# pre-build the native min-snap library
RUN python -c "from ipp_rl_tpu.trajgen import build_library; build_library()"

ENTRYPOINT ["python", "main.py"]
