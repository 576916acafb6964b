# Container recipe for the TPU-native SketchEdit framework.
#
# The reference ships a conda/CUDA container (reference Dockerfile:1-63,
# environment.yml: python 3.6 + pytorch + flask); this is the equivalent
# surface for the JAX/TPU stack: one image that serves the HTTP API, runs
# the batch CLI, or trains, on a Cloud TPU VM.
#
# Build:   docker build -t sketchedit-tpu .
# Serve:   docker run --privileged --net=host sketchedit-tpu
# CLI:     docker run --privileged --net=host sketchedit-tpu \
#              sketchedit-test --name celeb --use_cam --pool_type max ...
#
# --privileged/--net=host: the libtpu PJRT plugin needs the TPU device
# nodes; on GKE use the TPU device plugin instead.
#
# NOTE: the development environment this repo is built in has no network
# egress, so this image cannot be built/tested there; the executable
# stand-in is scripts/release_check.sh step 0, which builds the wheel,
# installs it into a FRESH venv, and runs the console-script smoke — the
# same install path this Dockerfile takes. Versions pin to pyproject.toml
# (the environment the benchmarks and parity numbers were recorded on).

FROM python:3.12-slim

WORKDIR /opt/sketchedit

# Layer 1: dependencies (cache-friendly — changes rarely).
# jax[tpu] pulls jaxlib + libtpu from the Google releases index.
RUN pip install --no-cache-dir \
    "jax[tpu]==0.9.0" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    "numpy>=2.0,<3" "pillow>=10" "orbax-checkpoint>=0.11" \
    "opencv-python-headless>=4.10"

# Layer 2: the framework itself.
COPY pyproject.toml README.md ./
COPY sketchedit_tpu ./sketchedit_tpu
RUN pip install --no-cache-dir --no-deps .

# Checkpoints/datasets mount at runtime; keep the image weight-free.
VOLUME ["/checkpoints", "/data"]

EXPOSE 9999
# Serving defaults mirror serve_api.py's documented invocation
# (sketchedit_tpu/cli/serve.py:18-21).
CMD ["sketchedit-serve", "--name", "celeb", "--checkpoints_dir", \
     "/checkpoints", "--joint_train_inp", "--use_cam", "--pool_type", \
     "max", "--dataset_mode", "base", "--port", "9999", \
     "--compute_dtype", "bfloat16", "--precision", "default"]
