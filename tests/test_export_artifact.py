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
    # a host that copied ONLY the .shlo still serves: batch/size come
    # from the program's own in_avals, the sidecar just augments
    os.remove(path + ".json")
    bare = load_edit_artifact(path)
    assert bare.meta["batch"] == 2 and bare.meta["size"] == 32
    got_img, got_mask = call(img, sk)
    want_img, want_mask = jax.jit(
        lambda i, s: editline2.edit_u8(params, i, s, config=config))(img, sk)
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(want_mask))


def test_serve_api_from_artifacts(tmp_path):
    """serve_api --serve_artifact: the production API serves from the
    exported programs alone (no checkpoint load, no model build)."""
    import base64
    import io
    import json
    import socket
    import time
    import urllib.error
    import urllib.request
    from PIL import Image
    from sketchedit_tpu.models import editline2
    from sketchedit_tpu.models.editline2 import EditLine2Config
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    from sketchedit_tpu.server.artifact import export_edit_artifact
    from sketchedit_tpu.utils.procutil import die_with_parent

    params = editline2.init_params(jax.random.PRNGKey(0))
    config = EditLine2Config(netg=DeepFillConfig(attention_impl="xla"))
    paths = []
    for b in (1, 2):
        p = str(tmp_path / f"edit_b{b}.shlo")
        export_edit_artifact(params, p, size=32, batch=b, config=config)
        paths.append(p)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "SKETCHEDIT_CACHE_DIR": os.path.join(REPO, ".jax_cache")}
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve_api.py"),
         "--name", "x", "--checkpoints_dir", str(tmp_path),
         "--dataset_mode", "base", "--port", str(port),
         "--serve_artifact", paths[0], "--serve_artifact", paths[1],
         "--edit_size", "32"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO, preexec_fn=die_with_parent)
    try:
        deadline = time.time() + 420
        warmed, seen = False, []
        for line in proc.stdout:
            seen.append(line)
            if "warmup done" in line:
                warmed = True
                break
            assert time.time() < deadline, "no warmup"
        if not warmed:       # EOF = server died before warmup
            pytest.fail(f"server died before warmup (rc={proc.poll()}): "
                        + "".join(seen[-15:]))
        import threading
        threading.Thread(target=lambda: proc.stdout.read(),
                         daemon=True).start()

        rs = np.random.RandomState(0)
        img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
        sk = ((rs.rand(32, 32) > 0.9) * 255).astype(np.uint8)

        def png(a):
            buf = io.BytesIO()
            Image.fromarray(a).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit",
            data=json.dumps({"image": png(img), "sketch": png(sk)}).encode(),
            headers={"Content-Type": "application/json"})
        # retry transport-level URLErrors once: connect-level flakes occur
        # on the loaded 1-core host (same rationale as test_serve_api)
        for attempt in range(2):
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    assert r.status == 200
                    out = json.loads(r.read())
                break
            except urllib.error.URLError:
                if attempt == 1:
                    raise
                time.sleep(10)
        comp = Image.open(io.BytesIO(base64.b64decode(out["image"])))
        assert comp.size == (32, 32)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


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
