"""Concurrent-client stress test against a live serve_api.py process:
spawns the server, hammers /edit with N threads for a fixed duration, and
records throughput + latency percentiles (SERVING_r3.json).

This exercises the production path end to end: HTTP parse -> base64 PNG
decode -> letterbox -> dynamic batching executor -> jitted TPU edit ->
PNG encode response. On the 1-core dev host the PNG codec work of client
and server shares one core with the tunnel client, so the recorded number
is a floor for a real serving host.

Usage: python scripts/serve_stress.py [--clients 32] [--secs 60]
       [--port 19876] [--out SERVING_r3.json] [--attach]
--attach reuses an already-running server on --port instead of spawning.
"""

import argparse
import base64
import io
import json
import os
import statistics
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _payload(size, kind="png", frames=1):
    import numpy as np
    from PIL import Image
    rs = np.random.RandomState(0)
    img = (rs.rand(size, size, 3) * 255).astype(np.uint8)
    sk = ((rs.rand(size, size) > 0.97) * 255).astype(np.uint8)

    if kind == "raw":
        from sketchedit_tpu.server import rawproto
        return (rawproto.encode(img, sk) * frames,
                "application/octet-stream")

    def png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    return (json.dumps({"image": png(img), "sketch": png(sk)}).encode(),
            "application/json")


def spawn_server(port):
    from sketchedit_tpu.utils.procutil import die_with_parent
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "serve_api.py"),
         "--name", "stress", "--checkpoints_dir", "/tmp/stress_ck",
         "--joint_train_inp", "--use_cam", "--pool_type", "max",
         "--dataset_mode", "base", "--port", str(port),
         "--compute_dtype", "bfloat16", "--precision", "default"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, preexec_fn=die_with_parent)
    deadline = time.time() + 1800        # cold remote compiles are slow
    # a silent hang blocks readline, so the deadline needs a side channel:
    # the watchdog SIGTERMs the child, which EOFs our pipe
    watchdog = threading.Timer(
        1800, lambda: proc.poll() is None and proc.terminate())
    watchdog.daemon = True
    watchdog.start()
    warmed = False
    for line in proc.stdout:
        sys.stdout.write(line)
        if "warmup done" in line:
            warmed = True
            break
        if time.time() > deadline:
            break
    watchdog.cancel()
    if not warmed:        # EOF = the child died (or was SIGTERMed) early
        raise RuntimeError(
            f"server failed to warm up (rc={proc.poll()})")
    threading.Thread(target=lambda: proc.stdout.read(), daemon=True).start()
    return proc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--secs", type=float, default=60.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--port", type=int, default=19876)
    ap.add_argument("--out", default=os.path.join(REPO, "SERVING_r4.json"))
    ap.add_argument("--attach", action="store_true")
    ap.add_argument("--payload", choices=("png", "raw"), default="png",
                    help="'raw' uses the octet-stream binary protocol "
                         "(server/rawproto.py) — no PNG codec on either "
                         "side")
    ap.add_argument("--frames", type=int, default=1,
                    help="raw only: images per request (bulk frames "
                         "amortize per-request HTTP/dispatch cost)")
    args = ap.parse_args()
    if args.frames > 1 and args.payload != "raw":
        ap.error("--frames needs --payload raw")

    body, content_type = _payload(args.size, args.payload, args.frames)
    proc = None if args.attach else spawn_server(args.port)
    url = f"http://127.0.0.1:{args.port}/edit"

    lat, errors = [], [0]
    lock = threading.Lock()
    stop = time.time() + args.secs

    def client():
        while time.time() < stop:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": content_type})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    r.read()
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
            except Exception:
                with lock:
                    errors[0] += 1

    t_start = time.time()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start

    # per-stage host-time breakdown from the live server (raw path):
    # wait_ms is device+batching; everything else is handler host CPU
    server_stats = None
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}/stats", timeout=30) as r:
            server_stats = json.load(r)
    except Exception as e:
        print(f"(/stats unavailable: {e})")

    try:
        if len(lat) >= 2:       # statistics.quantiles needs 2+ points
            lat.sort()
            q = statistics.quantiles(lat, n=100)
            result = {
                "what": f"serve_api.py /edit under {args.clients} concurrent"
                        f" clients, {args.size}x{args.size}, bf16, one v5e"
                        " chip via the tunnel (1-core host shares codec"
                        " work between client+server: a floor, not a peak)",
                "payload": args.payload,
                "frames_per_request": args.frames,
                "requests_ok": len(lat),
                "errors": errors[0],
                "wall_s": round(wall, 1),
                "throughput_rps": round(len(lat) / wall, 2),
                "throughput_imgs_s": round(len(lat) * args.frames / wall, 2),
                "latency_ms": {
                    "p50": round(q[49] * 1000),
                    "p90": round(q[89] * 1000),
                    "p99": round(q[98] * 1000),
                    "min": round(lat[0] * 1000),
                    "max": round(lat[-1] * 1000),
                },
                "server_stats": server_stats,
            }
        else:
            result = {"error": "too few successful requests",
                      "requests_ok": len(lat), "errors": errors[0]}
        print(json.dumps(result, indent=1))
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    finally:
        if proc is not None:
            proc.terminate()
            proc.wait(timeout=30)


if __name__ == "__main__":
    main()
