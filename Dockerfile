# kaptive-tpu container image.
#
# Mirrors the reference's container story (/root/reference/Dockerfile) with a
# plain pip build: the package has two runtime dependencies (numpy, jax) and
# an optional C++ toolchain for the native host-ingest path.  For TPU VMs,
# swap the jax install for the libtpu wheel (see the TPU note below).

FROM python:3.12-slim-bookworm AS base

WORKDIR /app

ENV PYTHONDONTWRITEBYTECODE=0 \
    PIP_NO_CACHE_DIR=1

# g++ enables the native hostio ingest library (built lazily at first import;
# everything still works without it, just with slower host-side FASTA ingest).
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

# Dependency layer first so source edits do not bust the cache.
COPY pyproject.toml README.md ./
RUN pip install numpy "jax>=0.4.30"

# TPU note: on a TPU VM base the CPU jax wheel above should instead be
#   pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY kaptive_tpu ./kaptive_tpu
COPY native ./native
RUN pip install --no-deps .

# Warm the native library build so first container run does not pay it.
RUN python -c "import kaptive_tpu.native" || true

ENTRYPOINT ["kaptive-tpu"]
CMD ["--help"]
