"""Held-out-quality training run (VERDICT r3 item 3).

Stages N variants of the 8 bundled release photos, splits them BY SOURCE
PHOTO (variants of 6 photos train; variants of the other 2 are never seen
— content-held-out, the strongest split this environment's 8 real images
admit), trains with in-training validation + best-checkpoint tracking +
--lambda_mask_rec, then scores the BEST checkpoint on the held-out split
only (edit_eval end-to-end + oracle-mask, mask_eval IoU) against a
fresh-init baseline, and renders a held-out grid PNG.

    python scripts/heldout_train_eval.py --workdir /tmp/heldout \
        --train_secs 3600 --report REAL_TRAIN_r4.json

Run on TPU (default env); JAX_PLATFORMS=cpu smoke-runs in minutes with
--train_secs 60 --images 32.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.real_train_demo import run_train  # noqa: E402

VAL_SOURCES = (6, 7)     # staged_%05d.jpg uses source photo i % n_sources


def split_stage(workdir, count, size):
    from scripts.stage_train_images import stage, source_paths
    all_dir = os.path.join(workdir, "all")
    train_dir = os.path.join(workdir, "imgs")   # run_train's fixed layout
    val_dir = os.path.join(workdir, "val")
    if os.path.isdir(train_dir) and os.listdir(train_dir):
        # resuming a previous stage: it must be COMPLETE and match the
        # requested count — a run interrupted mid-link (or re-run with a
        # different --images) would otherwise silently train on a
        # partial split and/or die at eval time on an empty val dir
        n_t = len(os.listdir(train_dir))
        n_v = (len(os.listdir(val_dir)) if os.path.isdir(val_dir) else 0)
        if n_v == 0 or n_t + n_v != count:
            raise SystemExit(
                f"stale/partial split under {workdir}: {n_t} train + "
                f"{n_v} val != {count} requested; delete {train_dir}, "
                f"{val_dir} and {all_dir} to re-stage")
        return train_dir, val_dir
    os.makedirs(all_dir, exist_ok=True)
    # the by-source split must use stage()'s ACTUAL source count: it maps
    # variant i -> source i % len(source_paths()), and with fewer than 8
    # staged photos (one release dir missing) an assumed %8 would put the
    # same source photos in both splits — silently voiding "held-out"
    n_src = len(source_paths())
    if n_src != 8:
        raise SystemExit(
            f"expected the 8 bundled release photos, found {n_src}; "
            "run `python datasets/stage_reference_assets.py --source "
            "/root/reference --demo` so the content-held-out split "
            "(sources 6-7) means what the report claims")
    written = stage(all_dir, count, size)
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    n_val = 0
    for p in written:
        i = int(os.path.basename(p).split("_")[1].split(".")[0])
        dst = val_dir if (i % n_src) in VAL_SOURCES else train_dir
        os.link(p, os.path.join(dst, os.path.basename(p)))
        n_val += dst == val_dir
    print(f"split: {count - n_val} train / {n_val} held-out "
          f"(sources {VAL_SOURCES} unseen in training)")
    return train_dir, val_dir


def run_eval(script, ck, name, image_dir, out_json, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "scripts", script),
           "--checkpoints_dir", ck, "--name", name,
           "--image_dir", image_dir, "--report", out_json] + list(extra)
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=3600, env={**os.environ})
    if res.returncode != 0:
        raise RuntimeError(f"{script} failed:\n{res.stdout[-2000:]}\n"
                           f"{res.stderr[-2000:]}")
    print(res.stdout.strip().splitlines()[-1])
    with open(out_json) as f:
        return json.load(f)


def parse_losses_from_log(path):
    """Recover run_train's losses list from a prior run's sidecar log
    (--eval_only: the training leg already happened, maybe in a process
    that later wedged)."""
    import json as _json
    from scripts.real_train_demo import LOSS_RE
    losses = []
    with open(path) as f:
        for line in f:
            m = LOSS_RE.search(line)
            if m:
                losses.append({
                    "epoch": int(m.group(1)), "iter": int(m.group(2)),
                    "ms_per_img": int(m.group(3))})
    return losses


def val_curve(metrics_jsonl):
    """Validation rows (kind == 'val') from the training metrics log."""
    rows = []
    with open(metrics_jsonl) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("kind") == "val":
                rows.append(d)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/heldout")
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=int, default=288)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--lambda_mask_rec", type=float, default=2.0)
    ap.add_argument("--print_iters", type=int, default=20)
    ap.add_argument("--train_secs", type=float, default=3600)
    ap.add_argument("--val_epoch_freq", type=int, default=5)
    ap.add_argument("--eval_items", type=int, default=48)
    ap.add_argument("--decode_cache_mb", type=int, default=None,
                    help="override the loader's decoded-frame cache "
                         "budget (data/editimage.py default 512MB is "
                         "under a 512^2-crop run's working set: ~576 "
                         "frames at 576^2 is ~575MB)")
    ap.add_argument("--report", default=None)
    ap.add_argument("--train_flag", action="append", default=[],
                    help="extra flag(s) passed through to train.py "
                         "(repeatable), e.g. --train_flag=--no_gan_loss "
                         "for the L1-only objective ablation")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training: score the workdir's existing "
                         "best checkpoint (ck/rtd/best_net_*) against the "
                         "existing split. For runs whose train leg died "
                         "irrecoverably (e.g. a wedged tunnel session) "
                         "after best-checkpoint snapshots landed — the "
                         "val curve is read from metrics.jsonl as usual")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    train_dir, val_dir = split_stage(args.workdir, args.images, args.size)
    ck = os.path.join(args.workdir, "ck")
    # the arch flags MUST match run_train's (use_cam/pool_type/
    # joint_train_inp change the forward graph but not the params — a
    # mismatch loads cleanly and scores a different network); the fresh
    # baseline has no opt.json snapshot to auto-restore from, so pass
    # them explicitly on every leg
    eval_extra = ("--items", str(args.eval_items),
                  "--load_size", str(args.size),
                  "--crop_size", str(args.crop),
                  "--use_cam", "--pool_type", "max", "--joint_train_inp")

    # fresh-init baseline on the held-out split (edit_eval falls back to
    # fresh init when the checkpoint dir is empty)
    baseline = run_eval("edit_eval.py", os.path.join(args.workdir, "fresh"),
                        "fresh", val_dir,
                        os.path.join(args.workdir, "baseline.json"),
                        eval_extra)

    # val_track: with --lambda_mask_rec > 0 the mask is live, and ANY
    # reconstruction metric (psnr/ssim/region_psnr) REWARDS the zero-mask
    # collapse — inputs==gt in this objective (docs/PARITY.md "Known
    # deltas"), so soft_mask=0 composites the input back and scores a
    # perfect reconstruction. Measured: a psnr-tracked run snapshots
    # epoch ~5 (mask_iou 0.009, val psnr 30.5) as "best" while the real
    # model matures to iou 0.65 / psnr ~19. mask_iou is the one tracked
    # metric the collapse cannot game.
    track = "mask_iou" if args.lambda_mask_rec > 0 else "psnr"
    if args.eval_only:
        losses, rc = parse_losses_from_log(
            os.path.join(args.workdir, "train_full.log")), "eval_only"
    else:
        train_extra = ["--val_image_dir", val_dir,
                       "--val_epoch_freq", str(args.val_epoch_freq),
                       "--val_items", "8", "--val_track", track]
        if args.decode_cache_mb is not None:
            train_extra += ["--decode_cache_mb", str(args.decode_cache_mb)]
        train_extra += args.train_flag
        losses, _, rc = run_train(args, args.workdir, train_extra,
                                  args.train_secs, "train")
    assert losses, "no loss lines parsed"
    curve = val_curve(os.path.join(ck, "rtd", "metrics.jsonl"))
    assert curve, "no validation rows in metrics.jsonl"
    best_rows = [r for r in curve if r.get("best")]
    for net in ("M", "G"):     # both nets the eval path runs; a missing
        assert os.path.exists(     # one silently falls back to fresh init
            os.path.join(ck, "rtd", f"best_net_{net}.npz")), \
            f"best_net_{net} was never snapshotted"

    heldout = run_eval("edit_eval.py", ck, "rtd", val_dir,
                       os.path.join(args.workdir, "heldout_e2e.json"),
                       eval_extra + ("--which_epoch", "best",
                                     "--require_checkpoint"))
    # the oracle leg also scores the NON-LEARNED fills (cv2 TELEA/NS,
    # blur-diffusion, outside-mean) under the identical protocol — the
    # honest in-region baselines a trained netG must beat (the fresh-init
    # net is not one: its soft_mass ~0.5 blends the original back in)
    heldout_oracle = run_eval(
        "edit_eval.py", ck, "rtd", val_dir,
        os.path.join(args.workdir, "heldout_oracle.json"),
        eval_extra + ("--which_epoch", "best", "--oracle_mask",
                      "--require_checkpoint", "--comparators", "all"))
    mask_iou = run_eval("mask_eval.py", ck, "rtd", val_dir,
                        os.path.join(args.workdir, "heldout_mask.json"),
                        ("--items", "16", "--load_size", str(args.size),
                         "--crop_size", str(args.crop),
                         "--which_epoch", "best"))

    grid_png = os.path.join(args.workdir, "heldout_grid.png")
    from scripts.real_train_demo import render_grid
    render_grid(args, args.workdir, grid_png, image_dir=val_dir,
                which_epoch="best")

    ms = sorted(d["ms_per_img"] for d in losses)
    report = {
        "what": "held-out-quality training: sources 6-7 of the 8 bundled "
                f"photos unseen in training; BEST checkpoint (val {track}) "
                "scored on the held-out split only",
        "val_track": track,
        "train_flags": args.train_flag,
        "staged_images": args.images, "batch": args.batch,
        "crop": args.crop, "compute_dtype": args.compute_dtype,
        "lambda_mask_rec": args.lambda_mask_rec,
        "train_exit": rc, "steps_seen": losses[-1]["iter"],
        "images_per_sec": round(1000.0 / ms[len(ms) // 2], 1),
        "val_curve": [{k: r.get(k) for k in
                       ("epoch", "psnr", "ssim", "region_psnr", "mask_iou",
                        "best") if k in r} for r in curve],
        "n_best_improvements": len(best_rows),
        "fresh_init_baseline": {"mean": baseline["mean"],
                                "items": baseline["items"]},
        "heldout_e2e": {"mean": heldout["mean"], "items": heldout["items"]},
        "heldout_oracle_mask": {"mean": heldout_oracle["mean"]},
        "classical_comparators": {
            c: d["mean"]
            for c, d in heldout_oracle.get("comparators", {}).items()},
        "heldout_mask_eval": mask_iou,
        "grid_png": grid_png,
    }
    comps = report["classical_comparators"]
    if comps:
        best_c = max(comps, key=lambda c: comps[c]["region_psnr"])
        report["in_region_vs_classical"] = {
            "best_classical": best_c,
            "classical_region_psnr": comps[best_c]["region_psnr"],
            "classical_region_l1": comps[best_c]["region_l1"],
            "trained_region_psnr":
                heldout_oracle["mean"]["region_psnr"],
            "trained_region_l1": heldout_oracle["mean"]["region_l1"],
            "trained_beats_classical": bool(
                heldout_oracle["mean"]["region_psnr"]
                > comps[best_c]["region_psnr"]),
        }
    blob = json.dumps(report, indent=1)
    print(blob[:2000])
    if args.report:
        with open(args.report, "w") as f:
            f.write(blob + "\n")
        print("report ->", args.report)


if __name__ == "__main__":
    main()
