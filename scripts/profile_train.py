"""Profile one jitted train step on the real TPU and print the top ops.

    python scripts/profile_train.py [--batch 16] [--size 256] [--mode train|infer]

Parses the Chrome-trace .trace.json.gz jax.profiler writes and aggregates
device op durations by fusion name. On this runtime, completion must be
forced by fetching a reduction (block_until_ready alone is not enough).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(batch, size, mode, logdir, dtype, precision):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sketchedit_tpu.runner import enable_persistent_cache
    enable_persistent_cache()

    rs = np.random.RandomState(0)
    if mode == "train":
        from sketchedit_tpu.train.trainer import (
            TrainConfig, init_train_state, train_step)
        # mirror bench.py's train config (bf16, backend-default matmul
        # passes) so the profile explains the published numbers
        cfg = TrainConfig(compute_dtype=dtype,
                          precision=None if precision == "default"
                          else precision)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        batch_d = {
            "image": jnp.asarray(rs.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)),
            "gt": jnp.asarray(rs.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)),
            "mask": jnp.asarray((rs.rand(batch, size, size, 1) > 0.95).astype(np.float32)),
            "edgegt": jnp.asarray((rs.rand(batch, size, size, 1) > 0.95).astype(np.float32)),
            "random_mask": jnp.asarray((rs.rand(batch, size, size, 1) > 0.7).astype(np.float32)),
            "random_mask2": jnp.asarray((rs.rand(batch, size, size, 1) > 0.7).astype(np.float32)),
        }
        step = jax.jit(lambda st, b, k: train_step(st, b, k, cfg),
                       donate_argnums=(0,))
        key = jax.random.PRNGKey(1)

        def one(i):
            nonlocal state
            state, metrics = step(state, batch_d, jax.random.fold_in(key, i))
            return float(metrics["G_total"])
    else:
        from sketchedit_tpu.models import editline2
        from sketchedit_tpu.models.editline2 import EditLine2Config
        # mirror bench.py's inference config (bf16 + backend-default)
        config = EditLine2Config(
            compute_dtype=dtype,
            precision=None if precision == "default" else precision)
        params = editline2.init_params(jax.random.PRNGKey(0))
        img = jnp.asarray(rs.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32))
        sk = jnp.asarray((rs.rand(batch, size, size, 1) > 0.95).astype(np.float32))
        fn = jax.jit(lambda p, i, s: editline2.edit(p, i, s, config=config))

        def one(i):
            return float(jnp.sum(fn(params, img, sk)[0].astype(jnp.float32)))

    for i in range(3):
        one(i)                                   # warmup + compile
    with jax.profiler.trace(logdir):
        for i in range(3, 6):
            one(i)


def parse(logdir, top=30):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    # leaf device ops live on the "XLA Ops" thread of the TensorCore pid;
    # module/step tracks are parents and would double count
    pid_names, tid_names = {}, {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3            # us -> ms
        durs[name] += dur
        counts[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"total device op time: {total:.2f} ms across 3 steps "
          f"({total/3:.2f} ms/step)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d:9.2f} ms  {counts[name]:4d}x  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--mode", choices=("train", "infer"), default="train")
    ap.add_argument("--logdir", default="/tmp/sketchedit_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--precision", default="default",
                    help="'default' (bench/serving config) or 'highest'")
    args = ap.parse_args()
    if not args.parse_only:
        import shutil
        shutil.rmtree(args.logdir, ignore_errors=True)
        run(args.batch, args.size, args.mode, args.logdir,
            args.dtype, args.precision)
    parse(args.logdir, args.top)


if __name__ == "__main__":
    main()
