"""Serving-artifact roundtrip: export the baked-weights edit program via
jax.export, deserialize it, and pin its outputs against the live model."""

import os
import subprocess
import sys

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_artifact_roundtrip(tmp_path):
    from sketchedit_tpu.models import editline2
    from sketchedit_tpu.models.editline2 import EditLine2Config
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    from sketchedit_tpu.server.artifact import (
        export_edit_artifact, load_edit_artifact)

    params = editline2.init_params(jax.random.PRNGKey(0))
    config = EditLine2Config(netg=DeepFillConfig(attention_impl="xla"))
    path = str(tmp_path / "edit.shlo")
    meta = export_edit_artifact(params, path, size=32, batch=2,
                                config=config)
    assert meta["bytes"] > 0 and os.path.exists(path + ".json")

    rs = np.random.RandomState(0)
    img = (rs.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(2, 32, 32, 1) > 0.9) * 255).astype(np.uint8)

    call = load_edit_artifact(path)
    assert call.meta["size"] == 32
    got_img, got_mask = call(img, sk)
    want_img, want_mask = jax.jit(
        lambda i, s: editline2.edit_u8(params, i, s, config=config))(img, sk)
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(want_mask))


def test_export_cli_runs(tmp_path):
    out = str(tmp_path / "a.shlo")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "SKETCHEDIT_CACHE_DIR": os.path.join(REPO, ".jax_cache")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "export_serving_artifact.py"),
         "--name", "x", "--checkpoints_dir", str(tmp_path),
         "--dataset_mode", "base", "--use_cam", "--pool_type", "max",
         "--joint_train_inp", "--export_size", "32", "--export_batch", "1",
         "--export_out", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out) and os.path.exists(out + ".json")
