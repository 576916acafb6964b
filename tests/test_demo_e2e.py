"""End-to-end demo-server test: the real demo.py process (real model, CPU)
serving the canvas page and running a sketch edit through the POST form."""

import base64
import io
import os
import socket
import subprocess
import sys
import time
import urllib.parse
import urllib.request

import numpy as np
import pytest

from sketchedit_tpu.utils.procutil import die_with_parent
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "SKETCHEDIT_CACHE_DIR": os.path.join(REPO, ".jax_cache")}


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def demo_server(tmp_path_factory):
    work = tmp_path_factory.mktemp("demo")
    imgdir = work / "static" / "images"
    imgdir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
        imgdir / "example.png")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "demo.py"),
         "--name", "x", "--checkpoints_dir", str(work / "ck"),
         "--joint_train_inp", "--use_cam", "--pool_type", "max",
         "--dataset_mode", "base", "--port", str(port),
         "--compute_dtype", "float32"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=ENV, cwd=str(work),          # static/ lives under the tmp cwd
        preexec_fn=die_with_parent)
    try:
        deadline = time.time() + 300
        for line in proc.stdout:
            if "demo server listening" in line:
                break
            if time.time() > deadline or proc.poll() is not None:
                pytest.fail(f"demo failed to start: {line!r}")
        # keep draining stdout so compile-load warnings can't fill the
        # pipe and block the server
        import threading
        threading.Thread(target=lambda: proc.stdout.read(),
                         daemon=True).start()
        yield port
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_canvas_page_and_edit_roundtrip(demo_server):
    port = demo_server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/",
                                timeout=30) as r:
        page = r.read().decode()
    assert "example.png" in page and "canvas" in page.lower()

    # sketch: a few white strokes on transparent-black, as the canvas posts
    sk = np.zeros((64, 64, 3), np.uint8)
    sk[20:22, 10:50] = 255
    buf = io.BytesIO()
    Image.fromarray(sk).save(buf, format="PNG")
    data_url = ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())
    form = urllib.parse.urlencode({
        "imgname": "example.png", "im_idx": "0", "mask": data_url}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/", data=form)
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.read().decode() == "/?idx=0"

    # the edited result is now example 0 and is served back on the page
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/?idx=0",
                                timeout=30) as r:
        page2 = r.read().decode()
    assert "result_" in page2

    # and the result image itself is fetchable via /static/
    name = page2.split('/static/images/')[1].split('"')[0]
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/static/images/{name}",
            timeout=30) as r:
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (64, 64)


def test_malformed_post_is_400(demo_server):
    port = demo_server
    form = urllib.parse.urlencode({"mask": "@@@notbase64"}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/", data=form)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            raise AssertionError(f"expected 400, got {r.status}")
    except urllib.error.HTTPError as e:
        assert e.code == 400
