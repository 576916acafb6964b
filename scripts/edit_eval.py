"""Quantitative edit-quality evaluation: PSNR / SSIM / masked L1.

The reference's test.py only writes result PNGs (/root/reference/
test.py:20-40) — it ships no quantitative eval. This scores a checkpoint
on the editimage reconstruction task (the training task: cut a partial
sketch from a region's edges, reconstruct the image from image+sketch):

  end-to-end   composed = edit(image, sketch)  — netM localizes, netG
               synthesizes, soft-mask composite (eval semantics of
               models/editline2.py). Region metrics use the sampled GT
               region; outside-L1 measures soft-mask leakage onto pixels
               that should pass through untouched.
  --oracle_mask  feeds the GT region directly to netG as the hard mask
               (netM bypassed) — the standard inpainting-quality metric,
               independent of netM localization (which collapses to zero
               under the reference-exact objective; docs/PARITY.md).
  --comparators  also scores NON-LEARNED region fills under the same
               oracle-mask protocol (cv2 TELEA / Navier-Stokes classical
               inpainting, iterative blur-diffusion fill, outside-mean
               fill). These are the honest in-region baselines a trained
               netG must beat — the fresh-init net is NOT one (its
               soft_mass ~0.5 blends half the original pixels back).

    python scripts/edit_eval.py --checkpoints_dir ck --name celeb \
        --image_dir imgs --items 32 [--oracle_mask] [--report out.json]

Batches items and jits one metric bundle; every batch fetches only a
handful of per-image scalars. Runs on CPU or TPU (JAX_PLATFORMS).
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
    ap.add_argument("--items", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--load_size", type=int, default=288)
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--oracle_mask", action="store_true")
    ap.add_argument("--which_epoch", default="latest",
                    help="checkpoint tag ('latest', 'best', or an epoch)")
    ap.add_argument("--report", default=None)
    # architecture passthroughs: these flags change the forward graph
    # (attention on/off, max vs avg pooling, guide2 zeroing) but NOT the
    # parameter set, so a mismatch with the trained config loads cleanly
    # and silently scores a different network. When the checkpoint dir
    # has an opt.json snapshot it is auto-restored (--load_from_opt_file
    # semantics: explicit flags still win); pass these explicitly for
    # fresh-init baselines that have no snapshot.
    ap.add_argument("--use_cam", action="store_true")
    ap.add_argument("--joint_train_inp", action="store_true")
    ap.add_argument("--pool_type", default=None)
    ap.add_argument("--comparators", default=None,
                    help="comma list of non-learned region-fill baselines "
                         "to score alongside (telea,ns,blur,mean); "
                         "'all' = every available one")
    ap.add_argument("--require_checkpoint", action="store_true",
                    help="fail instead of falling back to fresh init "
                         "when a net's checkpoint is missing (harnesses "
                         "scoring a trained model must set this — the "
                         "fallback WARNING is easy to swallow in captured "
                         "output)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    from sketchedit_tpu import runner
    from sketchedit_tpu.data import find_dataset_using_name
    from sketchedit_tpu.models import deepfill_c2, editline2
    from sketchedit_tpu.options.train_options import TrainOptions
    from sketchedit_tpu.utils import metrics

    from sketchedit_tpu.options import parse_argv
    # save=False: don't clobber the train run's opt snapshot
    argv = [
        "--name", args.name, "--checkpoints_dir", args.checkpoints_dir,
        "--dataset_mode", "editimage",
        "--train_image_dir", args.image_dir,
        "--batchSize", str(args.batch), "--load_size",
        str(args.load_size), "--crop_size", str(args.crop_size),
        "--preprocess_mode", "resize_and_crop", "--serial_batches",
        "--not_om", "--compute_dtype", args.compute_dtype,
        "--which_epoch", args.which_epoch]
    if args.use_cam:
        argv.append("--use_cam")
    if args.joint_train_inp:
        argv.append("--joint_train_inp")
    if args.pool_type is not None:
        argv += ["--pool_type", args.pool_type]
    # score the checkpoint with the architecture it was TRAINED with:
    # restore the train run's opt.json as defaults (explicit flags above
    # still override — set_defaults + re-parse)
    if os.path.exists(os.path.join(args.checkpoints_dir, args.name,
                                   "opt.json")):
        argv.append("--load_from_opt_file")
    opt = parse_argv(TrainOptions, argv, save=False)

    pipe = runner.build_pipeline(
        opt, require_checkpoint=args.require_checkpoint)
    params, config = pipe.params, pipe.config

    def oracle_edit(params, image, sketch, region):
        dt = jnp.dtype(config.compute_dtype)
        image, sketch = image.astype(dt), sketch.astype(dt)
        region = region.astype(dt)
        _, fake = deepfill_c2.apply(
            params["G"], image, image, region, region, sketch,
            config=config.netg, precision=config.lax_precision)
        return fake * region + image * (1.0 - region), region

    @partial(jax.jit, static_argnames=("oracle",))
    def score(params, image, sketch, region, *, oracle):
        if oracle:
            composed, soft = oracle_edit(params, image, sketch, region)
        else:
            composed, soft = editline2.edit(params, image, sketch,
                                            config=config)
        composed = composed.astype(jnp.float32)
        return {
            "psnr": metrics.psnr(composed, image),
            "ssim": metrics.ssim(composed, image),
            "region_psnr": metrics.masked_psnr(composed, image, region),
            "region_l1": metrics.masked_l1(composed, image, region),
            "outside_l1": metrics.masked_l1(composed, image, 1.0 - region),
            "region_frac": jnp.mean(region, axis=(1, 2, 3)),
            "soft_mass": jnp.mean(soft.astype(jnp.float32), axis=(1, 2, 3)),
        }

    # ---- non-learned comparators (same oracle-mask protocol) ----------
    def _box3(a):           # 3x3 box blur, edge-replicated, pure numpy
        p = np.pad(a, ((1, 1), (1, 1), (0, 0)), mode="edge")
        return (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:] +
                p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:] +
                p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 9.0

    def classical_fill(name, img_u8, reg_hw):
        """Fill `reg_hw` (H,W bool) of img_u8 from the outside pixels.
        Returns float32 (H,W,3) in [-1,1], outside pixels untouched."""
        reg3 = reg_hw[:, :, None]
        if name in ("telea", "ns"):
            import cv2
            flag = cv2.INPAINT_TELEA if name == "telea" else cv2.INPAINT_NS
            out = cv2.inpaint(np.ascontiguousarray(img_u8),
                              reg_hw.astype(np.uint8), 5, flag)
            filled = out.astype(np.float32) / 127.5 - 1.0
        else:
            img = img_u8.astype(np.float32) / 127.5 - 1.0
            if reg_hw.all():                 # degenerate: nothing known
                mean = np.zeros(3, np.float32)
            else:
                mean = np.stack([img[..., c][~reg_hw].mean()
                                 for c in range(3)])
            filled = np.where(reg3, mean, img).astype(np.float32)
            if name == "blur":
                # iterative diffusion: blur, re-impose known pixels;
                # T ~ image diagonal so information crosses the hole
                for _ in range(max(32, img.shape[0] // 4)):
                    filled = np.where(reg3, _box3(filled), filled)
        img = img_u8.astype(np.float32) / 127.5 - 1.0
        return np.where(reg3, filled, img).astype(np.float32)

    comp_names = []
    if args.comparators:
        comp_names = (["telea", "ns", "blur", "mean"]
                      if args.comparators == "all"
                      else [c for c in args.comparators.split(",") if c])
        bad = set(comp_names) - {"telea", "ns", "blur", "mean"}
        if bad:
            raise SystemExit(f"unknown comparators: {sorted(bad)}")
        if {"telea", "ns"} & set(comp_names):
            try:
                import cv2  # noqa: F401
            except ImportError:
                print("WARNING: cv2 unavailable — dropping telea/ns")
                comp_names = [c for c in comp_names
                              if c not in ("telea", "ns")]

    @jax.jit
    def score_composed(composed, image, region):
        composed = composed.astype(jnp.float32)
        return {
            "psnr": metrics.psnr(composed, image),
            "ssim": metrics.ssim(composed, image),
            "region_psnr": metrics.masked_psnr(composed, image, region),
            "region_l1": metrics.masked_l1(composed, image, region),
        }

    ds = find_dataset_using_name("editimage")()
    ds.initialize(opt, seed=args.seed)
    n_items = min(args.items, len(ds))
    if n_items == 0:
        raise SystemExit(f"no images under {args.image_dir}")

    rows = []
    comp_rows = {c: [] for c in comp_names}
    for start in range(0, n_items, args.batch):
        idx = list(range(start, min(start + args.batch, n_items)))
        items = [ds[i % len(ds)] for i in idx]
        while len(items) < args.batch:      # pad last batch, sliced below
            items.append(items[-1])
        image = jnp.asarray(np.stack(
            [it["image_u8"].astype(np.float32) / 127.5 - 1.0
             for it in items]))
        sketch = jnp.asarray(np.stack(
            [it["mask"].astype(np.float32) for it in items]))
        region = jnp.asarray(np.stack(
            [it["region_gt"].astype(np.float32) for it in items]))
        out = score(params, image, sketch, region, oracle=args.oracle_mask)
        out = {k: np.asarray(v)[:len(idx)] for k, v in out.items()}
        for j in range(len(idx)):
            rows.append({k: float(v[j]) for k, v in out.items()})
        print(f"items {idx[0]}..{idx[-1]}: " + " ".join(
            f"{k}={out[k].mean():.3f}" for k in
            ("psnr", "ssim", "region_psnr", "region_l1", "outside_l1")))
        for c in comp_names:
            comp_np = np.stack([classical_fill(
                c, items[j]["image_u8"],
                np.asarray(items[j]["region_gt"][:, :, 0], bool))
                for j in range(len(items))])
            cout = score_composed(jnp.asarray(comp_np), image, region)
            cout = {k: np.asarray(v)[:len(idx)] for k, v in cout.items()}
            for j in range(len(idx)):
                comp_rows[c].append(
                    {k: float(v[j]) for k, v in cout.items()})

    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    result = {"mode": "oracle_mask" if args.oracle_mask else "end_to_end",
              "items": len(rows), "crop_size": args.crop_size,
              "mean": mean, "per_item": rows}
    if comp_names:
        result["comparators"] = {
            c: {"mean": {k: float(np.mean([r[k] for r in comp_rows[c]]))
                         for k in comp_rows[c][0]},
                "per_item": comp_rows[c]}
            for c in comp_names}
    print("MEAN:", json.dumps(mean))
    for c in comp_names:
        print(f"COMPARATOR {c}:",
              json.dumps(result["comparators"][c]["mean"]))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(result, f, indent=1)
        print("report ->", args.report)


if __name__ == "__main__":
    main()
