# Container image for layerskip_tpu (counterpart of the reference's CPU-only
# Dockerfile / DOCKER.md). TPU access requires running on a TPU VM with the
# libtpu-enabled jax wheel; this image covers the CPU/test path.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/layerskip_tpu
COPY . .
RUN pip install --no-cache-dir -e ".[apps,train,test]" \
    && ./native/build.sh

ENTRYPOINT ["/workspace/layerskip_tpu/entrypoint.sh"]
