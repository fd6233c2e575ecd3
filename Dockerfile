# Development / training image for TPU VMs.
#
# TPU-native counterpart of the reference's CUDA dev image (the reference
# ships an nvidia/cuda SSH box + conda env): TPU runtimes need no vendor base
# image — libtpu ships as a pip wheel — so this is a plain slim-python image
# with jax[tpu]. Build, then run on a TPU VM with the host's /dev/accel*
# devices (privileged or --device passthrough).
#
#   docker build -t track-mjx-tpu .
#   docker run --privileged --net=host track-mjx-tpu \
#       track-mjx-tpu-train --config-name rodent-full-clips data_path=...

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        git build-essential \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY track_mjx_tpu ./track_mjx_tpu

# jax[tpu] pulls the matching libtpu from the Google releases index
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e .[viz,logging]

# multi-host pods: every worker runs the same command; jax.distributed picks
# up the TPU pod topology from the metadata server (pass distributed=true)
ENTRYPOINT ["track-mjx-tpu-train"]
