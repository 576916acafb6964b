"""train/validation.py: held-out validator + JSONL metrics log."""

import argparse
import json
import os

import numpy as np
from PIL import Image

import jax

from sketchedit_tpu.options import parse_argv
from sketchedit_tpu.options.train_options import TrainOptions
from sketchedit_tpu.train.trainer import TrainConfig, init_train_state
from sketchedit_tpu.train.validation import (MetricsLog, Validator,
                                             build_validator)


def _opt(tmp_path, **extra):
    imgs = tmp_path / "val_imgs"
    if not imgs.exists():
        imgs.mkdir()
        rs = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray(
                (rs.rand(64, 64, 3) * 255).astype(np.uint8)
            ).save(imgs / f"{i}.png")
    argv = ["--name", "v", "--checkpoints_dir", str(tmp_path / "ck"),
            "--dataset_mode", "editimage", "--train_image_dir", str(imgs),
            "--val_image_dir", str(imgs), "--val_items", "2",
            "--batchSize", "2", "--preprocess_mode", "resize_and_crop",
            "--load_size", "64", "--crop_size", "64", "--not_om",
            "--no_flip"]
    for k, v in extra.items():
        argv += [f"--{k}", str(v)]
    return parse_argv(TrainOptions, argv, save=False)


def test_validator_deterministic_and_finite(tmp_path):
    opt = _opt(tmp_path)
    cfg = TrainConfig()
    validator = build_validator(opt, cfg)
    assert validator is not None
    assert validator.image.shape == (2, 64, 64, 3)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    a = validator.run(state["params"])
    b = validator.run(state["params"])
    for k in ("psnr", "ssim", "region_psnr", "region_l1", "outside_l1",
              "mask_iou"):
        assert np.isfinite(a[k]), k
        assert a[k] == b[k]                 # fixed batch, same params
    assert -1.0 <= a["ssim"] <= 1.0
    assert 0.0 <= a["mask_iou"] <= 1.0
    # the fixed batch itself is rebuild-stable (reseeded per item)
    v2 = Validator(opt, cfg, opt.val_image_dir, items=2)
    np.testing.assert_array_equal(validator.image, v2.image)
    np.testing.assert_array_equal(validator.sketch, v2.sketch)


def test_validator_accepts_mesh_replicated_params(tmp_path):
    """train.py validates with the LIVE (possibly DP-replicated) train
    state; the validator's jit must follow that placement."""
    from sketchedit_tpu.parallel.mesh import data_parallel_mesh, replicate
    opt = _opt(tmp_path)
    cfg = TrainConfig()
    validator = build_validator(opt, cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    plain = validator.run(state["params"])
    mesh = data_parallel_mesh()
    repl = replicate(mesh, state["params"])
    got = validator.run(repl)
    assert np.isfinite(got["psnr"])
    # same program modulo placement; allow last-ulp compile variance
    np.testing.assert_allclose(got["ssim"], plain["ssim"], rtol=1e-6)


def test_build_validator_off_without_flag(tmp_path):
    opt = _opt(tmp_path)
    opt.val_image_dir = ""
    assert build_validator(opt, TrainConfig()) is None


def test_is_improvement_signs():
    from sketchedit_tpu.train.validation import is_improvement
    assert is_improvement("psnr", 10.0, None)
    assert is_improvement("psnr", 11.0, 10.0)
    assert not is_improvement("psnr", 9.0, 10.0)
    assert is_improvement("region_l1", 0.1, 0.2)      # lower is better
    assert not is_improvement("region_l1", 0.3, 0.2)


def test_recover_best_from_jsonl(tmp_path):
    from sketchedit_tpu.train.validation import recover_best
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        f.write('{"kind": "train", "losses": {}}\n')
        f.write('{"kind": "val", "epoch": 1, "psnr": 18.0, "region_l1": 0.3}\n')
        f.write('{"kind": "val", "epoch": 2, "psnr": 21.5, "region_l1": 0.2}\n')
        f.write('{"kind": "val", "epoch": 3, "psnr": 20.0, "region_l1": NaN}\n')
        f.write('{"kind": "val", "epoch": 4, "psnr"')   # torn tail line
    assert recover_best(str(p), "psnr") == 21.5
    assert recover_best(str(p), "region_l1") == 0.2
    assert recover_best(str(p), "mask_iou") is None
    assert recover_best(str(tmp_path / "absent.jsonl"), "psnr") is None


def test_metrics_log_modes(tmp_path):
    run_dir = tmp_path / "ck" / "run"
    base = dict(checkpoints_dir=str(tmp_path / "ck"), name="run")
    assert MetricsLog.from_opt(
        argparse.Namespace(metrics_log="off", **base)) is None
    auto = MetricsLog.from_opt(
        argparse.Namespace(metrics_log="auto", **base))
    assert auto.path == os.path.join(run_dir, "metrics.jsonl")
    auto.log({"kind": "train", "loss": 1.5})
    auto.log({"kind": "val", "psnr": float("nan")})   # must not raise
    rows = [json.loads(l) for l in open(auto.path)]
    assert rows[0] == {"kind": "train", "loss": 1.5}
    assert np.isnan(rows[1]["psnr"])
    explicit = MetricsLog.from_opt(argparse.Namespace(
        metrics_log=str(tmp_path / "m.jsonl"), **base))
    explicit.log({"a": 1})
    assert os.path.exists(tmp_path / "m.jsonl")


def test_resolve_val_track_auto():
    """auto -> mask_iou when the mask has supervision (reconstruction
    metrics reward the zero-mask collapse when inputs==gt), else psnr;
    explicit choices pass through."""
    from sketchedit_tpu.train.validation import resolve_val_track
    ns = argparse.Namespace
    assert resolve_val_track(ns(val_track="auto", lambda_mask_rec=0.0)) \
        == "psnr"
    assert resolve_val_track(ns(val_track="auto", lambda_mask_rec=1.0)) \
        == "mask_iou"
    assert resolve_val_track(ns(val_track="ssim", lambda_mask_rec=1.0)) \
        == "ssim"
