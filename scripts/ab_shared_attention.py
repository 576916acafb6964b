"""A/B the shared-tensor attention forward vs the two-stream one on TPU.

Times the raw kernels at the 1024^2-inference attention shape
(B=1, N=P=16129 patches, D=1536, bf16 streams) and the 2048^2 shape
unless --skip_2048. Timing is pipelined like bench.py: all iterations
are dispatched, then ONE reduction of the final output is fetched
before the clock is read — single-device execution is in-order, so the
fetch forces every queued iteration (tunnel rule: block_until_ready
alone does not prove execution; a fetch does).
"""

import argparse
import time

import numpy as np

from sketchedit_tpu import runner

runner.enable_persistent_cache()

import jax
import jax.numpy as jnp


def bench(tag, fn, args, iters=20):
    print(f"  [{tag}] compiling...", flush=True)
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out))                     # force compile + first run
    print(f"  [{tag}] compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_2048", action="store_true")
    ap.add_argument("--skip_smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ns = ap.parse_args()

    from sketchedit_tpu.ops.attention_pallas import (
        attention_core_pallas, attention_core_pallas_shared)

    shapes = []
    if not ns.skip_smoke:
        shapes.append(("smoke", 2, 961, 1536))   # 256^2-grid scale
    shapes.append(("1024sq", 1, 16129, 1536))
    if not ns.skip_2048:
        shapes.append(("2048sq", 1, 65025, 1536))

    for tag, B, P, D in shapes:
        rs = np.random.RandomState(0)
        V = jnp.asarray(rs.randn(B, P, D), jnp.bfloat16)
        ks = jnp.asarray(0.5 + rs.rand(B, D), jnp.bfloat16)
        keep = jnp.asarray((rs.rand(B, P) > 0.4).astype(np.float32))
        K = V * ks[:, None, :]

        two = jax.jit(lambda q, k, v, g: attention_core_pallas(q, k, v, g))
        one = jax.jit(lambda v, s, g: attention_core_pallas_shared(v, s, g))

        t2, s2 = bench(f"{tag}/two", two, (V, K, V, keep), ns.iters)
        t1, s1 = bench(f"{tag}/shared", one, (V, ks, keep), ns.iters)
        print(f"[{tag}] two-stream {t2*1e3:8.2f} ms   "
              f"shared {t1*1e3:8.2f} ms   speedup {t2/t1:0.3f}x   "
              f"checksums {s2:.1f}/{s1:.1f}", flush=True)


if __name__ == "__main__":
    main()
