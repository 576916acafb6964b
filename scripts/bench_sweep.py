"""Run bench.py across the headline configurations and record one JSON
artifact (BENCH_SWEEP_r{N}.json) so the README performance table is backed
by a single reproducible measurement set.

Real-TPU only (the tunneled chip): runs are SERIALIZED — one bench
subprocess at a time; killing one mid-flight wedges the device for ~2 min.
Each row is bench.py's own JSON line plus the env that produced it.

Usage: python scripts/bench_sweep.py [--out BENCH_SWEEP_r3.json] [--quick]
  --quick drops the 1024/2048 rows (long compiles on a cold cache).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, env overrides) — bench.py defaults: b32 256^2 bf16 pallas stream
CONFIGS = [
    ("infer 256^2 b32", {}),
    ("infer 256^2 b128", {"BENCH_BATCH": "128"}),
    ("infer 256^2 b1 chain", {"BENCH_BATCH": "1", "BENCH_MODE": "chain"}),
    ("infer 512^2 b8", {"BENCH_BATCH": "8", "BENCH_SIZE": "512"}),
    ("train 256^2 b16", {"BENCH_MODE": "train", "BENCH_BATCH": "16"}),
    ("train 512^2 b8", {"BENCH_MODE": "train", "BENCH_BATCH": "8",
                        "BENCH_SIZE": "512", "BENCH_ITERS": "10"}),
]
SLOW_CONFIGS = [
    ("infer 1024^2 b1", {"BENCH_BATCH": "1", "BENCH_SIZE": "1024",
                         "BENCH_ITERS": "10"}),
    ("infer 2048^2 b1", {"BENCH_BATCH": "1", "BENCH_SIZE": "2048",
                         "BENCH_ITERS": "3"}),
    ("train 1024^2 b1", {"BENCH_MODE": "train", "BENCH_BATCH": "1",
                         "BENCH_SIZE": "1024", "BENCH_ITERS": "5"}),
]


def run_one(label, overrides, timeout_s):
    env = dict(os.environ, **overrides)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
        timeout=timeout_s)
    wall = round(time.time() - t0, 1)
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = json.loads(ln)
    if line is None:
        return {"label": label, "env": overrides, "error":
                proc.stderr.strip().splitlines()[-3:], "wall_s": wall}
    line.update({"label": label, "env": overrides, "wall_s": wall})
    return line


def main():
    ap = argparse.ArgumentParser()
    # default is a SCRATCH name on purpose: pass --out BENCH_SWEEP_r{N}
    # explicitly to (re)write a round's committed evidence artifact — a
    # bare run must never clobber the recorded measurement set
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_SWEEP.json"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-config timeout (cold remote compiles are "
                         "slow; warm runs finish in minutes)")
    ap.add_argument("--resume", action="store_true",
                    help="keep rows already in --out (by label) and only "
                         "run the missing/errored configs — for picking "
                         "up an interrupted sweep")
    args = ap.parse_args()

    configs = CONFIGS if args.quick else CONFIGS + SLOW_CONFIGS
    rows = []
    done = set()
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            rows = [r for r in json.load(f).get("rows", [])
                    if "error" not in r]
        done = {r["label"] for r in rows}
        print(f"resume: keeping {sorted(done)}", flush=True)
    for label, overrides in configs:
        if label in done:
            continue
        print(f"== {label}", flush=True)
        try:
            row = run_one(label, overrides, args.timeout)
        except subprocess.TimeoutExpired:
            row = {"label": label, "env": overrides,
                   "error": f"timeout {args.timeout}s"}
        print(json.dumps(row), flush=True)
        rows.append(row)
        # write-through after every row: a wedged device mid-sweep still
        # leaves the completed rows on disk
        with open(args.out, "w") as f:
            json.dump({"hardware": "v5e-1 (tunneled)", "rows": rows},
                      f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
