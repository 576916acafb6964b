"""Evaluate netM mask localization against sampled GT regions.

For each item the editimage dataset draws a region, cuts the partial
sketch from the image's edges inside it, and the mask estimator must
recover the region from (image, sketch) alone. This script scores a
checkpoint on that task: soft-mask mass inside vs outside the GT region
and IoU at the 0.5 threshold (the operating point inference feeds netG —
models/editline2.py).

    python scripts/mask_eval.py --checkpoints_dir /tmp/rtd3/ck --name rtd \
        --image_dir /tmp/rtd3/imgs --items 16 [--report out.json]

Runs on CPU or TPU (whatever JAX_PLATFORMS selects). Context: under the
reference-exact objective netM collapses to a zero mask (IoU 0) — see
docs/PARITY.md "Known deltas"; --lambda_mask_rec training restores
localization (recorded: IoU@0.5 0.72 after ~10 min from scratch,
REAL_TRAIN_DEMO_r3.json).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints_dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--items", type=int, default=16)
    ap.add_argument("--load_size", type=int, default=288)
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--which_epoch", default="latest",
                    help="checkpoint tag ('latest', 'best', or an epoch)")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from sketchedit_tpu.runner import enable_persistent_cache
    enable_persistent_cache()
    from sketchedit_tpu.models import md_generator
    from sketchedit_tpu.params import checkpoint as ckpt
    from sketchedit_tpu.data import find_dataset_using_name
    from sketchedit_tpu.options.train_options import TrainOptions

    from sketchedit_tpu.options import parse_argv
    # save=False: never clobber the training run's opt.txt/opt.json
    # snapshot with these eval-time flags (--load_from_opt_file reads it)
    argv = [
        "--name", args.name, "--checkpoints_dir", args.checkpoints_dir,
        "--dataset_mode", "editimage",
        "--train_image_dir", args.image_dir,
        "--batchSize", "1", "--load_size", str(args.load_size),
        "--crop_size", str(args.crop_size), "--preprocess_mode",
        "resize_and_crop", "--serial_batches",
        "--not_om", "--compute_dtype", "float32",
        "--which_epoch", args.which_epoch]
    # restore the trained architecture from the run's opt.json snapshot
    # (netM is insensitive to the netG graph flags, but any netM
    # hyperparameter must match — explicit flags above still override)
    if os.path.exists(os.path.join(args.checkpoints_dir, args.name,
                                   "opt.json")):
        argv.append("--load_from_opt_file")
    opt = parse_argv(TrainOptions, argv, save=False)

    pm = ckpt.load_network("M", opt)
    if pm is None:
        raise SystemExit(f"no netM checkpoint under "
                         f"{args.checkpoints_dir}/{args.name}")

    ds = find_dataset_using_name("editimage")()
    ds.initialize(opt, seed=args.seed)
    rows = []
    for i in range(min(args.items, len(ds))):
        item = ds[i]
        img = (item["image_u8"].astype(np.float32) / 127.5 - 1.0)[None]
        sketch = item["mask"].astype(np.float32)[None]
        region = item["region_gt"][..., 0]
        soft, _ = md_generator.apply(pm, jnp.asarray(img),
                                     jnp.asarray(sketch))
        s = np.asarray(soft)[0, ..., 0]
        hard = s > 0.5
        rows.append({
            "region_frac": float(region.mean()),
            "soft_inside": float(s[region].mean()) if region.any() else 0.0,
            # symmetric guard: a region covering every pixel leaves
            # ~region empty and np.mean(empty) is NaN
            "soft_outside": (float(s[~region].mean())
                             if not region.all() else 0.0),
            "iou_0.5": float((hard & region).sum()
                             / max((hard | region).sum(), 1)),
        })
        print(f"item {i}: " + " ".join(
            f"{k}={v:.3f}" for k, v in rows[-1].items()))

    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    out = {"items": len(rows), "mean": mean, "per_item": rows}
    print("MEAN:", json.dumps(mean))
    if args.report:
        json.dump(out, open(args.report, "w"), indent=1)
        print("report ->", args.report)


if __name__ == "__main__":
    main()
