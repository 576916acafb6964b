"""Utility-script tests: torch export, VGG conversion, dataset prep."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def test_export_torch_checkpoint(tmp_path):
    import jax
    from sketchedit_tpu.models import md_generator
    from sketchedit_tpu.params import checkpoint as ckpt
    import argparse
    params = md_generator.init_params(jax.random.PRNGKey(0))
    opt = argparse.Namespace(checkpoints_dir=str(tmp_path), name="t")
    ckpt.save_network(params, "M", "latest", opt)

    dst = tmp_path / "latest_net_M.pth"
    # in-process: a subprocess re-pays the torch+jax cold start (~3 min on
    # a loaded host) and flaked on timeout twice; main() is import-safe
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "export_torch_checkpoint",
        os.path.join(REPO, "scripts", "export_torch_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = ["export_torch_checkpoint.py",
                "--src", str(tmp_path / "t" / "latest_net_M.npz"),
                "--dst", str(dst)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    assert dst.exists()

    # the exported .pth loads into the actual reference MDGenerator
    sys.path.insert(0, "/root/reference")
    import torch
    from models.networks.editline2_g import MDGenerator
    import argparse as ap
    net = MDGenerator(ap.Namespace())
    state = torch.load(dst, weights_only=True)
    net.load_state_dict(state)   # strict: every key must match
    np.testing.assert_allclose(
        net.conv1.weight.detach().numpy(),
        np.asarray(params["conv1"]["w"]).transpose(3, 2, 0, 1))

    # full interop: the reference net RUNNING OUR EXPORTED WEIGHTS must
    # produce our forward's output (train here -> deploy on the torch
    # release works end-to-end, not just key-for-key)
    from sketchedit_tpu.models import md_generator
    net.eval()
    rs = np.random.RandomState(0)
    img = rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    sk = (rs.rand(1, 32, 32, 1) > 0.9).astype(np.float32)
    with torch.no_grad():
        mask_t, imout_t = net(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(sk.transpose(0, 3, 1, 2)))
    import jax.numpy as jnp
    mask_j, imout_j = md_generator.apply(
        params, jnp.asarray(img), jnp.asarray(sk),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(mask_j)[0], mask_t[0].permute(1, 2, 0).numpy(),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(imout_j)[0], imout_t[0].permute(1, 2, 0).numpy(),
        atol=2e-5)


def test_convert_vgg19(tmp_path):
    import torch
    # synthesize a torchvision-shaped vgg19 state_dict
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    state, idx, cin = {}, 0, 3
    for c in cfg:
        if c == "M":
            idx += 1
            continue
        state[f"features.{idx}.weight"] = torch.randn(c, cin, 3, 3)
        state[f"features.{idx}.bias"] = torch.randn(c)
        cin = c
        idx += 2
    src = tmp_path / "vgg.pth"
    torch.save(state, src)
    dst = tmp_path / "vgg.npz"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_vgg19.py"),
         "--src", str(src), "--dst", str(dst)],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]

    from sketchedit_tpu.train.losses import load_vgg_params, vgg_loss
    import jax.numpy as jnp
    params = load_vgg_params(str(dst))
    assert len(params) == 16
    x = jnp.zeros((1, 64, 64, 3))
    y = jnp.ones((1, 64, 64, 3)) * 0.5
    loss = float(vgg_loss(params, x, y))
    assert np.isfinite(loss) and loss > 0


def test_coco_instance_map_rasterization():
    sys.path.insert(0, os.path.join(REPO, "datasets"))
    from coco_generate_instance_map import rasterize_instances
    anns = [{"segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]]},
            {"segmentation": [[12, 12, 15, 12, 15, 15]]}]
    inst = rasterize_instances(anns, 20, 20)
    assert inst[5, 5] == 1
    assert inst[13, 14] == 2
    assert inst[0, 0] == 0


def test_make_vis_overlay(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "datasets"))
    from make_vis import overlay
    img = np.zeros((8, 8, 3), np.uint8)
    sk = np.zeros((8, 8), np.uint8)
    sk[2, 3] = 255
    out = overlay(img, sk)
    assert tuple(out[2, 3]) == (0, 0, 255)
    assert tuple(out[0, 0]) == (0, 0, 0)


def test_heldout_split_requires_all_eight_sources(tmp_path, monkeypatch):
    """The content-held-out split maps variant i -> source i % n_sources;
    with fewer than the 8 bundled photos staged, an assumed %8 would put
    the same sources in both splits — the harness must refuse instead."""
    import scripts.stage_train_images as sti
    from scripts.heldout_train_eval import split_stage

    monkeypatch.setattr(sti, "source_paths", lambda: ["a.png"] * 4)
    with pytest.raises(SystemExit, match="8 bundled"):
        split_stage(str(tmp_path), 16, 64)
