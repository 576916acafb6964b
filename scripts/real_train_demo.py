"""Real-image training demo: train -> SIGTERM -> resume -> visualize.

Proves the full editimage->trainer->checkpoint loop beyond a synthetic
batch (VERDICT r2 item 5): stages a real-image directory from the bundled
release assets, trains from scratch (bf16 config) for a wall-clock bound,
SIGTERMs the process mid-run (exercising the preemption checkpoint),
resumes with --continue_train (asserting the step counter and losses
continue from the checkpoint), and renders a grid of
(input | partial sketch | predicted mask | edit) from the trained nets.

    python scripts/real_train_demo.py --workdir /tmp/rtd \
        --train_secs 300 --resume_secs 120 --report REAL_TRAIN_r3.json

Run on TPU (default env); pass JAX_PLATFORMS=cpu for a smoke run.
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from sketchedit_tpu.utils.procutil import die_with_parent

LOSS_RE = re.compile(r"epoch (\d+) iter (\d+) \((\d+) ms/img\) (\{.*\})")


def run_train(args, workdir, extra, secs, tag):
    cmd = [sys.executable, os.path.join(REPO, "train.py"),
           "--name", "rtd", "--checkpoints_dir",
           os.path.join(workdir, "ck"),
           "--dataset_mode", "editimage",
           "--train_image_dir", os.path.join(workdir, "imgs"),
           "--batchSize", str(args.batch), "--load_size", str(args.size),
           "--crop_size", str(args.crop), "--preprocess_mode",
           "resize_and_crop", "--use_cam", "--pool_type", "max",
           "--joint_train_inp", "--not_om", "--nThreads", "1",
           "--compute_dtype", args.compute_dtype,
           "--lambda_mask_rec", str(args.lambda_mask_rec),
           "--precision", "default", "--niter", "1000",
           "--print_freq", str(args.batch * args.print_iters),
           "--save_epoch_freq", "100000",
           "--save_latest_freq", "10000000"] + extra
    # unbuffered child: train.py's prints must reach this pipe line-by-
    # line (block-buffered stdout would defer the first loss line ~8KB)
    env = {**os.environ, "PYTHONUNBUFFERED": "1"}
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=REPO,
                            env=env, preexec_fn=die_with_parent)
    sidecar = open(os.path.join(workdir, f"{tag}_full.log"), "w")
    losses, resumed_step, t0 = [], None, None
    import threading as _threading
    term_lock = _threading.Lock()
    termed = False

    def _send_term_once(why):
        # train.py treats a SECOND signal as exit-now (no checkpoint), so
        # the timer thread and the read loop must never both fire
        nonlocal termed
        with term_lock:
            if termed or proc.poll() is not None:
                return
            termed = True
        print(f"[{tag}] sending SIGTERM ({why})", flush=True)
        proc.send_signal(signal.SIGTERM)
    # a fresh remote compile can take 15+ min on this runtime; the clock
    # starts at the first steady loss line. Never SIGTERM right after the
    # first line: the persistent-cache write of the freshly-compiled
    # executable (~90MB) is async and dying kills it, forcing the next
    # leg to recompile (observed live).
    hard_deadline = time.time() + secs + 1800
    # the deadline checks below only run when the child PRINTS; a child
    # wedged before its first output (stalled remote compile, hung tunnel
    # upload) would block readline forever — this timer is the backstop
    # that fires regardless of output
    import threading

    # route through _send_term_once: a raw send_signal here would leave
    # `termed` False, and the read loop could then deliver a SECOND
    # SIGTERM (train.py's exit-now path) mid-Orbax-save once the stalled
    # call returns
    watchdog = threading.Timer(hard_deadline - time.time(),
                               _send_term_once, args=("hard-deadline",))
    watchdog.daemon = True
    watchdog.start()

    # timed stop fires at t0+secs regardless of output: a child that
    # stalls mid-run (wedged tunnel call — observed live) stops printing,
    # and the in-loop check below would otherwise wait for the hard
    # deadline. SIGTERM only sets train.py's checkpoint-and-exit flag, so
    # firing during a stall is safe — the child acts on it when (if) the
    # stalled call returns.
    timed_stop = None

    for line in proc.stdout:
        sidecar.write(line)
        sidecar.flush()
        line = line.rstrip()
        m = LOSS_RE.search(line)
        if m:
            if t0 is None:
                t0 = time.time()       # clock starts at first steady print
                timed_stop = threading.Timer(
                    max(secs, 60.0), _send_term_once, args=("timer",))
                timed_stop.daemon = True
                timed_stop.start()
            # python repr prints non-finite floats lowercase (nan/inf),
            # which json rejects — a NaN loss step must not crash the
            # harness before the SIGTERM/checkpoint assertions run
            raw = (m.group(4).replace("'", '"').replace(" nan", " NaN")
                   .replace(" -inf", " -Infinity").replace(" inf", " Infinity"))
            losses.append({"epoch": int(m.group(1)), "iter": int(m.group(2)),
                           "ms_per_img": int(m.group(3)),
                           "losses": json.loads(raw)})
            print(f"[{tag}] {line}", flush=True)
        if "resumed full train state at step" in line:
            resumed_step = int(line.rsplit(" ", 1)[1])
            print(f"[{tag}] {line}", flush=True)
        timed_out = ((t0 and time.time() - t0 > max(secs, 60.0))
                     or time.time() > hard_deadline)
        if timed_out:
            _send_term_once("loop")
    rc = proc.wait(timeout=600)
    watchdog.cancel()
    if timed_stop is not None:
        timed_stop.cancel()
    sidecar.close()
    return losses, resumed_step, rc


def render_grid(args, workdir, out_png, *, image_dir=None,
                which_epoch="latest"):
    """4-row (input | sketch | mask | edit) grid PNG for a trained run.

    image_dir defaults to the run's training images; pass a held-out
    directory + which_epoch='best' to render the held-out exhibit
    (heldout_train_eval imports this — ONE renderer, no drift)."""
    import numpy as np
    import jax
    from PIL import Image
    from sketchedit_tpu.runner import build_pipeline, enable_persistent_cache
    from sketchedit_tpu.models import editline2
    from sketchedit_tpu.data import find_dataset_using_name
    from sketchedit_tpu.options.train_options import TrainOptions

    enable_persistent_cache()
    from sketchedit_tpu.options import parse_argv
    # save=False: don't overwrite the training run's opt snapshot with
    # these render-time flags
    opt = parse_argv(TrainOptions, [
        "--name", "rtd", "--checkpoints_dir",
        os.path.join(workdir, "ck"), "--dataset_mode", "editimage",
        "--train_image_dir", image_dir or os.path.join(workdir, "imgs"),
        "--batchSize", "4", "--load_size", str(args.size),
        "--crop_size", str(args.crop), "--preprocess_mode",
        "resize_and_crop", "--use_cam", "--pool_type", "max",
        "--joint_train_inp", "--not_om", "--serial_batches",
        "--compute_dtype", "float32",
        "--which_epoch", which_epoch], save=False)
    opt.isTrain = False                      # eval-mode pipeline load
    pipe = build_pipeline(opt, require_checkpoint=True)

    ds = find_dataset_using_name("editimage")()
    opt.isTrain = True
    ds.initialize(opt, seed=123)
    rows = []
    for i in range(4):
        item = ds[i]
        img = item["image_u8"].astype(np.float32) / 127.5 - 1.0
        sketch = item["mask"].astype(np.float32)
        composed, mask = pipe(img[None], sketch[None])
        to_u8 = lambda x: ((np.clip(x, -1, 1) + 1) * 127.5).astype(np.uint8)
        gray3 = lambda m: np.repeat(
            (np.clip(m, 0, 1) * 255).astype(np.uint8), 3, axis=-1)
        rows.append(np.concatenate(
            [item["image_u8"], gray3(sketch), gray3(np.asarray(mask[0])),
             to_u8(np.asarray(composed[0]))], axis=1))
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(out_png)
    print(f"grid (input | sketch | mask | edit) -> {out_png}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/rtd")
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=int, default=288)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--compute_dtype", default="bfloat16")
    # direct mask supervision ON for the demo: the reference-exact
    # objective (lambda=0) collapses netM to a zero mask when inputs==gt
    # (verified over a 250-epoch soak) — the grid would show black masks
    ap.add_argument("--lambda_mask_rec", type=float, default=2.0)
    ap.add_argument("--print_iters", type=int, default=10)
    ap.add_argument("--train_secs", type=float, default=300)
    ap.add_argument("--resume_secs", type=float, default=120)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from scripts.stage_train_images import stage
    imgs = os.path.join(args.workdir, "imgs")
    if not os.path.isdir(imgs) or not os.listdir(imgs):
        stage(imgs, args.images, args.size)
        print(f"staged {args.images} images")

    losses1, _, rc1 = run_train(args, args.workdir, [], args.train_secs,
                                "train")
    assert losses1, "no loss lines parsed from the first run"
    assert rc1 == 128 + signal.SIGTERM, f"expected SIGTERM exit, got {rc1}"
    iter_txt = os.path.join(args.workdir, "ck", "rtd", "iter.txt")
    assert os.path.exists(iter_txt), "preemption checkpoint missing iter.txt"

    losses2, resumed_step, _ = run_train(
        args, args.workdir, ["--continue_train"], args.resume_secs, "resume")
    assert resumed_step and resumed_step > 0, \
        f"resume did not restore a step counter (got {resumed_step})"
    assert losses2, "no loss lines parsed from the resumed run"
    # losses continue at the trained level, not from-scratch level. Judge
    # by the pure reconstruction term (L1c): G_total includes the GAN term,
    # which spikes whenever the discriminator happens to be hot at the
    # resume boundary (observed at 512^2 — fresh 2.53 vs resumed 2.95 while
    # L1c showed 0.81 -> 0.43, a clean continuation).
    g0, g1 = losses1[0]["losses"]["G_total"], losses2[0]["losses"]["G_total"]
    l0, l1 = losses1[0]["losses"]["L1c"], losses2[0]["losses"]["L1c"]
    print(f"fresh first L1c {l0:.3f} / G_total {g0:.3f} -> "
          f"resumed first L1c {l1:.3f} / G_total {g1:.3f}")
    assert l1 < l0, "resumed losses did not continue from the checkpoint"

    grid_png = os.path.join(args.workdir, "train_demo_grid.png")
    render_grid(args, args.workdir, grid_png)

    if args.report:
        ms = sorted(d["ms_per_img"] for d in losses1 + losses2)
        report = {
            "staged_images": args.images,
            "batch": args.batch, "crop": args.crop,
            "compute_dtype": args.compute_dtype,
            "resumed_step": resumed_step,
            "first_fresh_G_total": g0, "first_resumed_G_total": g1,
            "first_fresh_L1c": l0, "first_resumed_L1c": l1,
            "last_G_total": losses2[-1]["losses"]["G_total"],
            "median_ms_per_img": ms[len(ms) // 2],
            "images_per_sec": round(1000.0 / ms[len(ms) // 2], 1),
            "grid_png": grid_png,
            "loss_trace": losses1 + losses2,
        }
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
        print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
