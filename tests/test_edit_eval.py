"""scripts/edit_eval.py end-to-end: both modes on the bundled fixtures.

The reference ships no quantitative eval (its test.py writes PNGs only);
this pins the greenfield PSNR/SSIM eval CLI: report schema, the
oracle-mask invariant (hard composite => outside-region L1 exactly 0 and
soft_mass == region_frac), and finite metrics in end-to-end mode.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "SKETCHEDIT_CACHE_DIR": os.path.join(REPO, ".jax_cache")}
# prefer the staged workspace copy (datasets/ is gitignored reference-derived
# content); fall back to the reference checkout so a fresh clone still runs
IMAGES = os.path.join(REPO, "datasets", "face_release", "images")
if not os.path.isdir(IMAGES):
    IMAGES = "/root/reference/datasets/face_release/images"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(IMAGES),
    reason="no face_release fixtures staged and no reference checkout")


def _run(tmp_path, *extra):
    report = tmp_path / ("report_%d.json" % len(extra))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "edit_eval.py"),
         "--checkpoints_dir", str(tmp_path / "ck"), "--name", "x",
         "--image_dir", IMAGES, "--items", "2", "--batch", "2",
         "--load_size", "72", "--crop_size", "64",
         "--report", str(report), *extra],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    with open(report) as f:
        return json.load(f)


def test_edit_eval_end_to_end(tmp_path):
    out = _run(tmp_path)
    assert out["mode"] == "end_to_end" and out["items"] == 2
    m = out["mean"]
    for k in ("psnr", "ssim", "region_psnr", "region_l1", "outside_l1",
              "region_frac", "soft_mass"):
        assert np.isfinite(m[k]), k
    assert 0.0 < m["region_frac"] < 1.0
    assert -1.0 <= m["ssim"] <= 1.0
    assert len(out["per_item"]) == 2


def test_edit_eval_oracle_mask(tmp_path):
    out = _run(tmp_path, "--oracle_mask")
    assert out["mode"] == "oracle_mask"
    m = out["mean"]
    # hard GT-region composite: pixels outside the region pass through
    # untouched, and the "soft" mask IS the region
    assert m["outside_l1"] == 0.0
    assert m["soft_mass"] == m["region_frac"]
    assert np.isfinite(m["region_psnr"]) and m["region_l1"] > 0.0
