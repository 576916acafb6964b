"""A/B the D-split attention forward vs the standard one on TPU
(VERDICT r3 item 5).

The standard kernel's q tile is capped at 512 rows by the f32 PV
accumulator (q_tile x D x 4B scoped VMEM); the D-split kernel halves the
accumulator (2 passes over K, V streamed half-D per pass) so 1024-row
q tiles fit — 2K + V HBM traffic per q-tile pair instead of 2K + 2V, at
+50% matmul FLOPs (sim recomputed per half). Times the raw kernels at the
1024^2 and 2048^2 inference attention shapes (B=1, N=P, D=1536, bf16).
Run on an IDLE host (a concurrent load inflated one r3 A/B leg 30%).

    python scripts/ab_dsplit_attention.py [--iters 20] [--skip_2048]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchedit_tpu import runner

runner.enable_persistent_cache()

import jax
import jax.numpy as jnp


def bench(tag, fn, args, iters=20):
    print(f"  [{tag}] compiling...", flush=True)
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))   # force compile + first run
    print(f"  [{tag}] compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_2048", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--q_tile", type=int, default=1024,
                    help="dsplit q tile (the point of the split)")
    ap.add_argument("--out", default=None)
    ns = ap.parse_args()

    from sketchedit_tpu.ops.attention_pallas import (
        attention_core_pallas, _attention_core_dsplit_raw)

    shapes = [("1024sq", 1, 16129, 1536)]
    if not ns.skip_2048:
        shapes.append(("2048sq", 1, 65025, 1536))

    results = {"what": "D-split PV accumulator vs standard attention fwd "
                       "(bf16 streams, raw kernels)",
               "q_tile_dsplit": ns.q_tile}
    for tag, B, P, D in shapes:
        rs = np.random.RandomState(0)
        V = jnp.asarray(rs.randn(B, P, D), jnp.bfloat16)
        K = jnp.asarray(rs.randn(B, P, D), jnp.bfloat16)
        keep = jnp.asarray((rs.rand(B, P) > 0.4).astype(np.float32))

        std = jax.jit(lambda q, k, v, g: attention_core_pallas(q, k, v, g))
        dsp = jax.jit(lambda q, k, v, g: _attention_core_dsplit_raw(
            q, k, v, g, q_tile=ns.q_tile))

        t0, s0 = bench(f"{tag}/std", std, (V, K, V, keep), ns.iters)
        try:
            t1, s1 = bench(f"{tag}/dsplit", dsp, (V, K, V, keep), ns.iters)
        except Exception as e:
            print(f"[{tag}] dsplit FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results[tag] = {"std_ms": round(t0 * 1e3, 2),
                            "dsplit": f"failed: {type(e).__name__}"}
            continue
        print(f"[{tag}] std {t0*1e3:8.2f} ms   dsplit {t1*1e3:8.2f} ms   "
              f"speedup {t0/t1:0.3f}x   checksums {s0:.1f}/{s1:.1f}",
              flush=True)
        results[tag] = {"std_ms": round(t0 * 1e3, 2),
                        "dsplit_ms": round(t1 * 1e3, 2),
                        "speedup": round(t0 / t1, 3)}
    print(json.dumps(results, indent=1))
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
