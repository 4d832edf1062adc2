# Deployment image for torchsr-tpu (capability parity with the
# reference's Docker packaging, /root/reference/Dockerfile, redone for
# TPU hosts: jax[tpu] wheels replace the NGC PyTorch base image, and no
# CUDA/NCCL setup is needed — the TPU runtime handles device discovery
# and cross-host rendezvous).
FROM python:3.12-slim

WORKDIR /opt/torchsr-tpu

# TPU-enabled JAX (libtpu comes with the jax[tpu] extra).
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY pyproject.toml README.md ./
COPY torchsr_tpu ./torchsr_tpu
RUN pip install --no-cache-dir .[observability]

# Bake in torchvision's VGG19 weights for the perceptual loss, exactly
# like the reference image (reference Dockerfile:11): fetch + sha256
# verify + convert to the native msgpack form in the auto-discovery
# cache, so `torchsr train` needs no --vgg-weights flag. Build with
# --build-arg FETCH_VGG=0 on airgapped builders (then mount the file
# or run tools/fetch_vgg19.py --from-file at deploy time).
COPY tools/fetch_vgg19.py ./tools/fetch_vgg19.py
ARG FETCH_VGG=1
RUN if [ "$FETCH_VGG" = "1" ]; then \
      pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu \
      && python tools/fetch_vgg19.py \
      && rm -f ~/.cache/torchsr_tpu/vgg19-dcbb9e9d.pth \
      && pip uninstall -y torch; \
    fi

# Bundle the fixed progress-sample image (reference Dockerfile:35): the
# per-epoch SR render of media/waterfalls-low-res.png lands in output/.
COPY media ./media

# Multi-host coordination defaults (reference Dockerfile:19); the
# trainer reads torchrun-style or SLURM_* env vars (parallel/mesh.py).
ENV MASTER_PORT=29500

ENTRYPOINT ["torchsr"]
CMD ["--help"]
