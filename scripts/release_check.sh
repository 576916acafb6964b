#!/bin/bash
# End-of-round release checklist: everything the driver/judge exercises.
set -e -o pipefail    # pipes through tail/tee must not mask failures
cd "$(dirname "$0")/.."

echo "=== 0/7 packaging: wheel -> fresh venv -> console-script smoke ==="
# The clean-environment reproduction leg (the Dockerfile takes the same
# wheel-install path but cannot be built here: zero egress). The wheel
# installs into a FRESH venv with --no-deps, so what is tested is our
# packaging: metadata, package data, console entry points. Dependencies
# (jax/numpy/pillow) come from the host interpreter's site-packages via
# PYTHONPATH — this image reaches no package index; the venv's own tree
# contains ONLY our wheel, so a missing dependency declaration or a
# stale-file import would still fail loudly.
PKG_SCRATCH=$(mktemp -d)
pip wheel --quiet --no-deps --no-build-isolation -w "$PKG_SCRATCH" .
python -m venv "$PKG_SCRATCH/venv"
"$PKG_SCRATCH/venv/bin/pip" install --quiet --no-deps "$PKG_SCRATCH"/sketchedit_tpu-*.whl
HOST_SP=$(python -c 'import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))')
(cd /tmp && JAX_PLATFORMS=cpu PYTHONPATH="$HOST_SP" \
    "$PKG_SCRATCH/venv/bin/python" - <<'EOF'
import sketchedit_tpu, sys
assert "venv" in sketchedit_tpu.__file__, sketchedit_tpu.__file__
from sketchedit_tpu.cli import test_main, train_main, serve_main, demo_main
from sketchedit_tpu.runner import build_pipeline
from sketchedit_tpu.models import editline2
print("venv package import ok:", sketchedit_tpu.__file__)
EOF
)
(cd /tmp && JAX_PLATFORMS=cpu PYTHONPATH="$HOST_SP" \
    "$PKG_SCRATCH/venv/bin/sketchedit-test" --help >/dev/null \
    && echo "console script ok: sketchedit-test --help")
rm -rf "$PKG_SCRATCH"

echo "=== 1/7 unit + parity suite (CPU) ==="
python -m pytest tests/ -q

echo "=== 2/7 single-chip entry compile check ==="
python - <<'EOF'
import __graft_entry__ as ge
import jax, jax.numpy as jnp
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print("entry ok", float(jnp.sum(out[0].astype(jnp.float32))))
EOF

echo "=== 3/7 multi-chip dry run (8 virtual devices) ==="
python -c "import __graft_entry__ as ge; ge.dryrun_multichip(8)"

echo "=== 4/7 benchmark (real TPU) ==="
python bench.py

echo "=== 5/7 release launch script ==="
python datasets/stage_reference_assets.py >/dev/null 2>&1 || true
if [ -d datasets/face_release/images ]; then
    sh test_celeb.sh | tail -1
else
    echo "skipped (no fixtures staged)"
fi

echo "=== 6/7 train benchmark (real TPU) -> BENCH_TRAIN.json ==="
BENCH_MODE=train BENCH_BATCH=${BENCH_TRAIN_BATCH:-16} BENCH_ITERS=10 \
    python bench.py | tail -1 | tee BENCH_TRAIN.json

echo "=== 7/7 git status ==="
git status --short
echo "release check complete"
