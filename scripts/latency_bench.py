"""Single-edit latency pinning (VERDICT r4 item 4).

An interactive editor's headline number is per-edit wall latency, not
chain throughput (which swung 191-224 img/s between r4 sweeps). This
measures the REAL single-edit critical path — uint8 host frame -> device
upload -> edit_u8 -> uint8 composite fetched back to host — one edit at a
time (b1), at 256^2 and 512^2, over N_ROUNDS interleaved rounds so the
variance band is part of the artifact rather than a surprise.

    python scripts/latency_bench.py --report BENCH_LATENCY_r5.json

Run on an idle host (check `uptime`): a concurrent CPU job inflates the
host-side legs ~2x (measured r4, SERVING_r4.json caveat). The per-edit
fetch of the u8 composite is what forces execution on this runtime
(block_until_ready alone does not guarantee it; CLAUDE.md).

Reference surface being outclassed: the reference serves single edits
through demo.py:86-108 (one torch forward per request on GPU); it
publishes no latency numbers (BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (256, 512)


def pct(sorted_ms, q):
    if not sorted_ms:
        return None
    i = min(len(sorted_ms) - 1, max(0, round(q / 100 * (len(sorted_ms) - 1))))
    return sorted_ms[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--edits_256", type=int, default=40)
    ap.add_argument("--edits_512", type=int, default=15)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    from sketchedit_tpu.runner import enable_persistent_cache
    from sketchedit_tpu.models import editline2
    from sketchedit_tpu.models.editline2 import EditLine2Config
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig

    enable_persistent_cache()
    jnp = jax.numpy
    config = EditLine2Config(netg=DeepFillConfig(attention_impl="pallas"),
                             precision=None, compute_dtype="bfloat16")
    params = editline2.init_params(jax.random.PRNGKey(0))

    from functools import partial
    fn = jax.jit(partial(editline2.edit_u8, config=config))

    rs = np.random.RandomState(0)
    frames = {}
    for s in SIZES:
        n = max(args.edits_256, args.edits_512)
        frames[s] = [((rs.rand(1, s, s, 3) * 255).astype(np.uint8),
                      ((rs.rand(1, s, s, 1) > 0.92) * 255).astype(np.uint8))
                     for _ in range(n)]

    def one_edit(img, sk):
        t0 = time.perf_counter()
        comp, _mask = fn(params, jnp.asarray(img), jnp.asarray(sk))
        comp = np.asarray(comp)          # fetch: forces execution
        dt = (time.perf_counter() - t0) * 1e3
        assert comp.dtype == np.uint8 and comp.shape == img.shape
        return dt

    # warm compiles (both sizes) before any timed edit
    for s in SIZES:
        one_edit(*frames[s][0])

    per_size = {s: [] for s in SIZES}
    round_medians = {s: [] for s in SIZES}
    load1 = os.getloadavg()[0]
    for r in range(args.rounds):
        for s, n_edits in ((256, args.edits_256), (512, args.edits_512)):
            lat = [one_edit(*frames[s][i % len(frames[s])])
                   for i in range(n_edits)]
            per_size[s].extend(lat)
            lat.sort()
            round_medians[s].append(round(pct(lat, 50), 2))
        print(f"round {r + 1}/{args.rounds}: "
              + "  ".join(f"{s}^2 p50 {round_medians[s][-1]:.1f} ms"
                          for s in SIZES), flush=True)

    report = {
        "what": "single-edit latency, b1, uint8 host->device->host round "
                "trip per edit (upload + edit_u8 + composite fetch), "
                "bfloat16/pallas, interleaved rounds on one warm program",
        "rounds": args.rounds,
        "host_load1_at_start": round(load1, 2),
        "sizes": {},
    }
    for s in SIZES:
        lat = sorted(per_size[s])
        report["sizes"][f"{s}x{s}"] = {
            "edits": len(lat),
            "p50_ms": round(pct(lat, 50), 2),
            "p90_ms": round(pct(lat, 90), 2),
            "p99_ms": round(pct(lat, 99), 2),
            "min_ms": round(lat[0], 2),
            "max_ms": round(lat[-1], 2),
            "round_p50s_ms": round_medians[s],
            "edits_per_sec_at_p50": round(1000.0 / pct(lat, 50), 1),
        }
    blob = json.dumps(report, indent=1)
    print(blob)
    if args.report:
        with open(args.report, "w") as f:
            f.write(blob + "\n")
        print("report ->", args.report)


if __name__ == "__main__":
    main()
