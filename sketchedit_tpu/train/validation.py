"""Held-out validation during training + structured metrics logging.

The reference publishes no training code at all ("training code coming
soon"); this gives the greenfield trainer the two observability surfaces
a production trainer needs:

* ``Validator`` — a fixed, deterministic held-out batch scored through
  the REAL eval path (models/editline2.edit: 0.5-threshold to netG,
  soft-mask composite) with the device-reduced metrics of
  utils/metrics.py (PSNR / SSIM / region PSNR / region L1 / outside-
  region leakage) plus netM localization IoU@0.5 against the sampled GT
  region. One jitted program, compiled once; every call fetches a
  handful of scalars.
* ``MetricsLog`` — append-only JSONL (one object per line, flushed per
  write so a preempted run keeps everything written so far). train.py
  logs a ``kind:"train"`` row at every print and a ``kind:"val"`` row
  per validation.
"""

import argparse
import json
import os

import numpy as np


class MetricsLog:
    """Append-only JSONL metrics log."""

    def __init__(self, path):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    @staticmethod
    def from_opt(opt):
        """Resolve --metrics_log: 'auto' -> <run_dir>/metrics.jsonl,
        'off' -> None, anything else is an explicit path."""
        spec = getattr(opt, "metrics_log", "off")
        if spec == "off":
            return None
        if spec == "auto":
            spec = os.path.join(opt.checkpoints_dir, opt.name,
                                "metrics.jsonl")
        return MetricsLog(spec)

    def log(self, row: dict):
        json.dump(row, self._f, allow_nan=True)
        self._f.write("\n")


# sign convention for --val_track best-checkpoint selection
HIGHER_IS_BETTER = {"psnr": True, "ssim": True, "region_psnr": True,
                    "mask_iou": True, "region_l1": False,
                    "outside_l1": False}


def resolve_val_track(opt) -> str:
    """'auto' -> mask_iou when the mask has supervision, else psnr.

    With --lambda_mask_rec > 0 the mask is live and EVERY reconstruction
    metric rewards the zero-mask collapse (inputs==gt in this objective,
    docs/PARITY.md "Known deltas": soft_mask=0 composites the input back
    and scores a perfect reconstruction — REAL_TRAIN_r4_psnr_trap.json
    shows a psnr-tracked run snapshotting the collapse as "best").
    mask_iou is the tracked metric the collapse cannot game."""
    track = getattr(opt, "val_track", "auto")
    if track != "auto":
        return track
    return ("mask_iou" if getattr(opt, "lambda_mask_rec", 0) > 0
            else "psnr")


def is_improvement(metric: str, value: float, best: float | None) -> bool:
    if best is None:
        return True
    return value > best if HIGHER_IS_BETTER[metric] else value < best


def recover_best(metrics_log_path: str, metric: str) -> float | None:
    """Best tracked val value recorded in an existing metrics.jsonl —
    lets --continue_train keep the historic best instead of overwriting
    best_net_* with the first post-resume validation."""
    if not os.path.exists(metrics_log_path):
        return None
    best = None
    with open(metrics_log_path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except ValueError:
                continue                      # torn tail line from a kill
            if row.get("kind") == "val" and metric in row:
                v = row[metric]
                if isinstance(v, (int, float)) and not np.isnan(v) \
                        and is_improvement(metric, v, best):
                    best = float(v)
    return best


def build_validator(opt, train_cfg):
    """A Validator over --val_image_dir, or None when the flag is unset."""
    val_dir = getattr(opt, "val_image_dir", "")
    if not val_dir:
        return None
    return Validator(opt, train_cfg, val_dir,
                     items=getattr(opt, "val_items", 8))


class Validator:
    def __init__(self, opt, train_cfg, val_dir, *, items=8, seed=7):
        from sketchedit_tpu.data import find_dataset_using_name
        from sketchedit_tpu.models.editline2 import EditLine2Config

        # same preprocessing as training, but over the held-out dir,
        # deterministic order, and no photometric jitter
        vopt = argparse.Namespace(**vars(opt))
        vopt.train_image_dir = val_dir
        vopt.train_image_list = ""
        vopt.serial_batches = True
        vopt.cjit = None                     # no photometric jitter in val
        ds = find_dataset_using_name("editimage")()
        ds.initialize(vopt, seed=seed)
        if len(ds) == 0:
            raise ValueError(f"--val_image_dir {val_dir}: no images found")
        n = min(items, len(ds))
        picked = []
        for i in range(n):
            ds.reseed((seed, 0, i))   # item-keyed draws: stable across runs
            picked.append(ds[i])
        self.image = np.stack([it["image_u8"].astype(np.float32) / 127.5
                               - 1.0 for it in picked])
        self.sketch = np.stack([it["mask"].astype(np.float32)
                                for it in picked])
        self.region = np.stack([it["region_gt"].astype(np.float32)
                                for it in picked])
        # eval in f32 regardless of the train compute dtype: validation
        # tracks quality, and bf16-vs-f32 metric jitter would alias as
        # training signal
        self.config = EditLine2Config(
            netg=train_cfg.netg, precision=train_cfg.precision,
            compute_dtype="float32")
        self._fn = None

    def _score(self, params, image, sketch, region):
        import jax.numpy as jnp
        from sketchedit_tpu.models import editline2
        from sketchedit_tpu.utils import metrics

        composed, soft = editline2.edit(params, image, sketch,
                                        config=self.config)
        composed = composed.astype(jnp.float32)
        hard = (soft.astype(jnp.float32) > 0.5).astype(jnp.float32)
        inter = jnp.sum(hard * region, axis=(1, 2, 3))
        union = jnp.maximum(
            jnp.sum(jnp.maximum(hard, region), axis=(1, 2, 3)), 1.0)
        out = {
            "psnr": metrics.psnr(composed, image),
            "ssim": metrics.ssim(composed, image),
            "region_psnr": metrics.masked_psnr(composed, image, region),
            "region_l1": metrics.masked_l1(composed, image, region),
            "outside_l1": metrics.masked_l1(composed, image, 1.0 - region),
            "mask_iou": inter / union,
        }
        return {k: jnp.mean(v) for k, v in out.items()}

    def run(self, params) -> dict:
        """Score the fixed held-out batch; returns {metric: float}.

        ``params`` is the live train-state params dict ({"M","G","D"} —
        edit reads M and G); replicated/sharded params are fine, the
        jitted program follows their placement.
        """
        import jax
        if self._fn is None:
            # close over self (config/static state) — only arrays are
            # traced arguments
            self._fn = jax.jit(
                lambda p, i, s, r: self._score(p, i, s, r))
        vals = self._fn(params, self.image, self.sketch, self.region)
        return {k: float(v) for k, v in vals.items()}
