"""End-to-end serving-API test: one live server, valid edit + the
client-error -> 400 contract (incl. valid-JSON non-object bodies)."""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
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


def _b64_png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(port, body, as_json=True):
    data = (json.dumps(body) if as_json else body).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/edit", data=data,
        headers={"Content-Type": "application/json"})
    # generous: under a loaded host (full-suite parallelism) a CPU edit
    # can take minutes; 180s flaked once, and a connect-level URLError
    # flaked once at 540s on the 1-core host — retry transport errors
    # once (HTTPError is a real server response and is never retried)
    for attempt in range(2):
        try:
            with urllib.request.urlopen(req, timeout=540) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, None
        except urllib.error.URLError:
            if attempt == 1:
                raise
            time.sleep(10)


@pytest.fixture(scope="module")
def api_server(tmp_path_factory):
    port = _free_port()
    ck = tmp_path_factory.mktemp("ck")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve_api.py"),
         "--name", "x", "--checkpoints_dir", str(ck), "--joint_train_inp",
         "--use_cam", "--pool_type", "max", "--dataset_mode", "base",
         "--port", str(port), "--max_batch", "2",
         "--compute_dtype", "float32"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=ENV, cwd=REPO, preexec_fn=die_with_parent)
    try:
        deadline = time.time() + 420
        seen, warmed = [], False
        for line in proc.stdout:
            seen.append(line)
            if "warmup done" in line:
                warmed = True
                break
            if time.time() > deadline:
                pytest.fail("server failed to warm up in time: "
                            + "".join(seen[-20:]))
        if not warmed:
            # stdout EOF = the process died before warm-up; without this
            # check the tests would run against a dead server and report
            # a bare ConnectionRefusedError instead of the real crash
            pytest.fail("server exited before warmup (rc="
                        f"{proc.poll()}): " + "".join(seen[-20:]))
        # keep draining stdout: later compile-cache loads emit kilobytes
        # of cpu_aot warnings; a full pipe would block the server
        import threading
        threading.Thread(target=lambda: proc.stdout.read(),
                         daemon=True).start()
        yield port
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_edit_roundtrip(api_server):
    rs = np.random.RandomState(0)
    img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(64, 64) > 0.97) * 255).astype(np.uint8)
    status, out = _post(api_server, {"image": _b64_png(img),
                                     "sketch": _b64_png(sk)})
    assert status == 200
    comp = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    mask = Image.open(io.BytesIO(base64.b64decode(out["mask"])))
    assert comp.size == (64, 64)            # resized back to the input size
    assert mask.size == (64, 64)


def test_nonsquare_edit_keeps_size(api_server):
    """A 160x90 (16:9) request letterboxes onto the shared 256 canvas
    (same compiled shape as every other request) and comes back at its
    own size."""
    rs = np.random.RandomState(1)
    img = (rs.rand(90, 160, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(90, 160) > 0.97) * 255).astype(np.uint8)
    status, out = _post(api_server, {"image": _b64_png(img),
                                     "sketch": _b64_png(sk)})
    assert status == 200
    comp = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    mask = Image.open(io.BytesIO(base64.b64decode(out["mask"])))
    assert comp.size == (160, 90)
    assert mask.size == (160, 90)


def test_client_errors_are_400(api_server):
    cases = [
        ("not json at all", False),          # JSONDecodeError
        ('"abc"', False),                    # valid JSON, non-object
        ("[1, 2]", False),                   # valid JSON, list
        ({"image": 5, "sketch": 6}, True),   # non-string b64 fields
        ({"sketch": "eA=="}, True),          # missing key
        ({"image": "bm90cG5n", "sketch": "bm90cG5n"}, True),  # not an image
    ]
    for body, as_json in cases:
        status, _ = _post(api_server, body, as_json=as_json)
        assert status == 400, f"{body!r} -> {status}"


def _post_raw(port, body, timeout=540):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/edit", data=body,
        headers={"Content-Type": "application/octet-stream"})
    for attempt in range(2):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            return e.code, None
        except urllib.error.URLError:
            if attempt == 1:
                raise
            time.sleep(10)


def test_raw_payload_roundtrip_canvas_native(api_server):
    """octet-stream at the canvas size: zero-codec path; the response
    must byte-match the JSON path's PNG-decoded pixels (same executor,
    same program — PNG is lossless)."""
    from sketchedit_tpu.server import rawproto
    rs = np.random.RandomState(3)
    img = (rs.rand(256, 256, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(256, 256) > 0.97) * 255).astype(np.uint8)

    status, body = _post_raw(api_server, rawproto.encode(img, sk))
    assert status == 200
    comp_raw, mask_raw = rawproto.decode(body)
    assert comp_raw.shape == (256, 256, 3)

    status, out = _post(api_server, {"image": _b64_png(img),
                                     "sketch": _b64_png(sk)})
    assert status == 200
    comp_json = np.asarray(
        Image.open(io.BytesIO(base64.b64decode(out["image"]))))
    np.testing.assert_array_equal(comp_raw, comp_json)


def test_raw_payload_letterboxes_other_sizes(api_server):
    from sketchedit_tpu.server import rawproto
    rs = np.random.RandomState(4)
    img = (rs.rand(90, 160, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(90, 160) > 0.97) * 255).astype(np.uint8)
    status, body = _post_raw(api_server, rawproto.encode(img, sk))
    assert status == 200
    comp, mask = rawproto.decode(body)
    assert comp.shape == (90, 160, 3)
    assert mask.shape == (90, 160, 1)


def test_rawproto_decode_frames_unit():
    """Pure protocol unit: multi-frame bodies split exactly; malformed
    tails raise (no server needed)."""
    from sketchedit_tpu.server import rawproto
    rs = np.random.RandomState(5)
    a = ((rs.rand(8, 8, 3) * 255).astype(np.uint8),
         ((rs.rand(8, 8) > 0.5) * 255).astype(np.uint8))
    b = ((rs.rand(16, 24, 3) * 255).astype(np.uint8),
         ((rs.rand(16, 24) > 0.5) * 255).astype(np.uint8))
    body = rawproto.encode(*a) + rawproto.encode(*b)
    frames = rawproto.decode_frames(body)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0][0], a[0])
    np.testing.assert_array_equal(frames[1][0], b[0])
    assert frames[1][1].shape == (16, 24, 1)
    # single-frame decode() refuses multi-frame bodies
    with pytest.raises(rawproto.RawProtoError):
        rawproto.decode(body)
    # truncated second frame
    with pytest.raises(rawproto.RawProtoError):
        rawproto.decode_frames(body[:-1])
    # trailing garbage shorter than a header
    with pytest.raises(rawproto.RawProtoError):
        rawproto.decode_frames(rawproto.encode(*a) + b"SKE")
    with pytest.raises(rawproto.RawProtoError):
        rawproto.decode_frames(b"")
    with pytest.raises(rawproto.RawProtoError):
        rawproto.decode_frames(rawproto.encode(*a) * 3, max_frames=2)


def test_raw_bulk_request_roundtrip(api_server):
    """Several concatenated frames in ONE POST come back as the same
    number of frames, each at its own size, matching the single-frame
    responses bit-for-bit (same executor, same program)."""
    from sketchedit_tpu.server import rawproto
    rs = np.random.RandomState(6)
    img1 = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    sk1 = ((rs.rand(64, 64) > 0.97) * 255).astype(np.uint8)
    img2 = (rs.rand(90, 160, 3) * 255).astype(np.uint8)
    sk2 = ((rs.rand(90, 160) > 0.97) * 255).astype(np.uint8)

    bulk = rawproto.encode(img1, sk1) + rawproto.encode(img2, sk2)
    status, body = _post_raw(api_server, bulk)
    assert status == 200
    frames = rawproto.decode_frames(body)
    assert [f[0].shape for f in frames] == [(64, 64, 3), (90, 160, 3)]

    status, single = _post_raw(api_server, rawproto.encode(img1, sk1))
    assert status == 200
    comp_single, _ = rawproto.decode(single)
    np.testing.assert_array_equal(frames[0][0], comp_single)


def test_raw_payload_client_errors_are_400(api_server):
    cases = [
        b"",                                   # shorter than header
        b"NOPE" + b"\x01\x00" + b"\x40\x00" * 2,   # bad magic
        b"SKED" + b"\x09\x00" + b"\x40\x00" * 2,   # bad version
        b"SKED" + b"\x01\x00" + b"\x40\x00\x40\x00" + b"x" * 7,  # short body
    ]
    for body in cases:
        status, _ = _post_raw(api_server, body, timeout=60)
        assert status == 400, f"{body[:12]!r} -> {status}"


def test_wrong_path_is_404(api_server):
    status, _ = _post_path(api_server, "/nope")
    assert status == 404


def test_healthz_and_stats(api_server):
    """Ops endpoints: /healthz answers after warmup; /stats reflects the
    traffic this test file already sent through the executor."""
    with urllib.request.urlopen(
            f"http://127.0.0.1:{api_server}/healthz", timeout=30) as r:
        assert r.status == 200 and r.read() == b"ok"
    # one known-good edit so the counters are provably nonzero even if
    # this test runs first
    rs = np.random.RandomState(2)
    img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(64, 64) > 0.97) * 255).astype(np.uint8)
    status, _ = _post(api_server, {"image": _b64_png(img),
                                   "sketch": _b64_png(sk)})
    assert status == 200
    with urllib.request.urlopen(
            f"http://127.0.0.1:{api_server}/stats", timeout=30) as r:
        assert r.status == 200
        stats = json.loads(r.read())
    assert stats["http"]["ok"] >= 1
    ex = stats["executor"]
    assert ex["requests_served"] >= 1
    assert ex["batches_dispatched"] >= 1
    assert ex["batch_errors"] == 0
    assert sum(ex["batch_size_histogram"].values()) \
        == ex["batches_dispatched"]
    assert ex["dispatch_ms"]["p50"] is not None
    # host-time attribution (SERVING_r5): the executor separates batch
    # assembly and scatter from the device dispatch...
    assert ex["assemble_ms"]["p50"] is not None
    assert ex["scatter_ms"]["p50"] is not None
    # ...and the raw path keeps a per-stage ledger. A raw POST here makes
    # the counters provably nonzero regardless of test order.
    from sketchedit_tpu.server import rawproto
    status, _ = _post_raw(api_server, rawproto.encode(img, sk))
    assert status == 200
    # the ledger lands just AFTER the response write (write_ms needs the
    # write), so poll briefly instead of racing the handler thread
    for _ in range(50):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{api_server}/stats", timeout=30) as r:
            rp = json.loads(r.read())["raw_path_stages"]
        if rp["totals"]["bodies"] >= 1:
            break
        time.sleep(0.2)
    assert rp["totals"]["bodies"] >= 1
    assert rp["totals"]["frames"] >= rp["totals"]["bodies"]
    assert rp["per_frame_ms"]["wait"] > 0
    assert set(rp["per_frame_ms"]) == {
        "read", "decode", "letterbox", "submit", "wait", "to_u8",
        "encode", "write"}
    assert rp["host_ms_per_frame_excl_wait"] >= 0.0
    # unknown GET path stays 404
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{api_server}/nope", timeout=30) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404


def _post_path(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, None
    except urllib.error.HTTPError as e:
        return e.code, None
