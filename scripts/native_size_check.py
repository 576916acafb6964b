"""Native (non-/8) size evidence on real hardware (VERDICT r4 item 2).

Compares the PRE-COMPOSITE generator output (`generate()["fake"]`, f32,
HIGHEST precision) between attention_impl=pallas and =xla at each native
size, and PROVES the Pallas kernel is in the executed program by checking
the compiled HLO of the exact compiled object that runs: the pallas leg
must contain `tpu_custom_call` (the Mosaic kernel's custom-call target)
and the xla leg must not. The compiled objects themselves are executed
(not re-jitted), so "the kernel ran" follows from "this program ran and
its bytes were fetched".

Why the earlier artifacts showed an implausible exact 0.0: they diffed the
COMPOSITE output of a gain-0.02 random-init model. At that init the
attention-layer activations are ~1e-3, the pallas-vs-xla divergence there
is ~1e-10, and the composite adds 0.5*image (~0.5) — the divergence is
below f32 resolution of the sum, so the compare was vacuous (both legs DID
run their own impls; `tests/test_native_sizes.py` pins <1e-3 parity with
exact interpret-mode math). This producer uses gain=1.0 xavier weights so
activations are O(1) and the hardware numerics delta is visible, and it
diffs the generator output before the composite dilutes it.

    python scripts/native_size_check.py --report NATIVE_SIZE_r5.json

The reference hard-crashes on every one of these sizes (editline_g.py:
203-210 — the attention fold emits an (H/4 - 1) grid that fails the
stage-2 concat; verified live at 252x252). Accepting them at all is a
capability the reference never had (data/testimage_dataset.py:99-103
rounds sizes to /8 to dodge the crash).
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = ((252, 252), (300, 200), (640, 360))
PALLAS_MARK = "tpu_custom_call"


def top_device_ops(logdir, n=6):
    """Aggregate 'XLA Ops' device events from the newest trace."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return {}
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        trace = json.load(fh)
    tid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    durs = defaultdict(float)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((ev.get("pid"), ev.get("tid")), ""):
            continue
        durs[ev.get("name", "?")] += ev.get("dur", 0) / 1e3   # us -> ms
    return {k: round(v, 3) for k, v in
            sorted(durs.items(), key=lambda kv: -kv[1])[:n]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default=None)
    ap.add_argument("--logdir", default="/tmp/native_size_trace")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from sketchedit_tpu.runner import enable_persistent_cache
    from sketchedit_tpu.models import editline2
    from sketchedit_tpu.models.editline2 import EditLine2Config
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig

    enable_persistent_cache()
    backend = jax.default_backend()
    # gain=1.0: O(1) activations so the pallas/xla numerics delta is
    # measurable (see module docstring); quality is tests' job, not this
    # artifact's.
    params = editline2.init_params(jax.random.PRNGKey(0), gain=1.0)

    cfgs = {
        impl: EditLine2Config(
            netg=DeepFillConfig(attention_impl=impl),
            precision="highest", compute_dtype="float32")
        for impl in ("pallas", "xla")}

    def fake_fn(impl):
        def fn(params, img, sk):
            from sketchedit_tpu.models.editline2 import pad_to_grid
            H, W = img.shape[1:3]
            img_p, sk_p, _ = pad_to_grid(img, sk, 8)
            out = editline2.generate(params, img_p, sk_p,
                                     config=cfgs[impl])
            return out["fake"][:, :H, :W]
        return fn

    report = {
        "what": "native non-/8 sizes, REAL hardware: generate()['fake'] "
                "(pre-composite) with attention_impl pallas vs xla, f32 "
                "weights at gain=1.0 / HIGHEST precision; pallas presence "
                "proven by tpu_custom_call in the compiled HLO of the "
                "exact executed program (absent from the xla leg); "
                "exact-math <1e-3 parity is pinned separately by "
                "tests/test_native_sizes.py interpret mode",
        "backend": backend, "sizes": {}, "ok": True}

    shutil.rmtree(args.logdir, ignore_errors=True)
    for i, (h, w) in enumerate(SIZES):
        rs = np.random.RandomState(100 + i)
        img = jnp.asarray(rs.rand(1, h, w, 3).astype(np.float32) * 2 - 1)
        sk = jnp.asarray((rs.rand(1, h, w, 1) > 0.92).astype(np.float32))

        compiled, hlo_has_kernel = {}, {}
        for impl in ("pallas", "xla"):
            c = jax.jit(fake_fn(impl)).lower(params, img, sk).compile()
            compiled[impl] = c
            hlo_has_kernel[impl] = PALLAS_MARK in c.as_text()
        # run the EXACT compiled objects; completion on this runtime is
        # only guaranteed by fetching bytes
        outs = {}
        if i == 0:
            with jax.profiler.trace(args.logdir):
                outs["pallas"] = np.asarray(
                    compiled["pallas"](params, img, sk), dtype=np.float32)
        else:
            outs["pallas"] = np.asarray(
                compiled["pallas"](params, img, sk), dtype=np.float32)
        outs["xla"] = np.asarray(
            compiled["xla"](params, img, sk), dtype=np.float32)
        a, b = outs["pallas"], outs["xla"]
        diff = float(np.max(np.abs(a - b)))
        scale = float(np.max(np.abs(b)))
        row = {
            "max_abs_diff": diff,
            # the stacked sigmoid gates shrink activations, so 'fake' is
            # small even at gain=1 — the RELATIVE diff is the honest
            # numerics signal (~1e-3: MXU bf16-pass + online-softmax
            # reassociation, same band as the aligned-size kernel tests)
            "rel_max_diff": diff / max(scale, 1e-30),
            "out_max_abs": scale,
            "out_mean_abs": float(np.mean(np.abs(b))),
            "pallas_hlo_has_tpu_custom_call": bool(hlo_has_kernel["pallas"]),
            "xla_hlo_has_tpu_custom_call": bool(hlo_has_kernel["xla"]),
            # distinct programs: the executed pallas HLO contains the
            # Mosaic custom-call, the executed xla HLO does not
            "distinct_programs": bool(hlo_has_kernel["pallas"]
                                      and not hlo_has_kernel["xla"]),
        }
        row["ok"] = bool(row["distinct_programs"]
                         and np.isfinite(a).all() and np.isfinite(b).all()
                         and 0.0 < diff < 0.1)
        report["sizes"][f"{h}x{w}"] = row
        report["ok"] &= row["ok"]
        print(f"{h}x{w}: max|pallas-xla| = {diff:.3e}  "
              f"hlo[pallas]={hlo_has_kernel['pallas']} "
              f"hlo[xla]={hlo_has_kernel['xla']}  ok={row['ok']}")

    report["pallas_leg_top_device_ops_ms"] = top_device_ops(args.logdir)

    blob = json.dumps(report, indent=1)
    print(blob)
    if args.report:
        with open(args.report, "w") as f:
            f.write(blob + "\n")
        print("report ->", args.report)
    if not report["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
