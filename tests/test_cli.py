"""End-to-end CLI and runner tests on tiny synthetic data (CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def tiny_dataset(tmp_path):
    imgs = tmp_path / "images"
    edges = tmp_path / "edges"
    imgs.mkdir()
    edges.mkdir()
    rs = np.random.RandomState(0)
    names = []
    for i in range(3):
        name = f"img{i}"
        Image.fromarray(
            (rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            imgs / f"{name}.png")
        sk = np.zeros((64, 64), np.uint8)
        sk[20:40, 30] = 255
        Image.fromarray(sk).save(edges / f"{name}.png")
        names.append(name)
    (tmp_path / "list.txt").write_text(
        "\n".join(f"{n}.png" for n in names) + "\n")
    return tmp_path


def test_testpy_cli_end_to_end(tiny_dataset, tmp_path):
    out_dir = tmp_path / "out"
    mask_dir = tmp_path / "outm"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               SKETCHEDIT_CACHE_DIR=os.path.join(REPO, ".jax_cache"))
    cmd = [sys.executable, os.path.join(REPO, "test.py"),
           "--batchSize", "2", "--name", "clitest",
           "--checkpoints_dir", str(tmp_path / "ckpt"),
           "--joint_train_inp", "--dataset_mode", "testimage",
           "--image_dirs", str(tiny_dataset / "images"),
           "--mask_dirs", str(tiny_dataset / "edges"),
           "--image_lists", str(tiny_dataset / "list.txt"),
           "--image_postfix", ".png", "--mask_postfix", ".png",
           "--model", "editline2", "--netG", "deepfillc2",
           "--pool_type", "max", "--use_cam",
           "--output_dir", str(out_dir),
           "--output_mask_dir", str(mask_dir)]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    outs = sorted(os.listdir(out_dir))
    assert outs == ["img0.png", "img1.png", "img2.png"]
    assert sorted(os.listdir(mask_dir)) == outs
    im = Image.open(out_dir / "img0.png")
    assert im.size == (64, 64) and im.mode == "RGB"
    m = Image.open(mask_dir / "img0.png")
    assert m.size == (64, 64)


def test_runner_data_parallel_mesh():
    """build_pipeline shards batches over the 8 virtual CPU devices."""
    import argparse
    from sketchedit_tpu.runner import build_pipeline
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    opt = argparse.Namespace(
        checkpoints_dir="/nonexistent", name="x", which_epoch="latest",
        use_cam=True, pool_type="max", no_mask_cc=False,
        no_mask_coarse=False, joint_train_inp=True, attention_impl="xla",
        precision="highest", compute_dtype="float32", data_parallel=n,
        init_type="xavier", init_variance=0.02)
    pipe = build_pipeline(opt)
    assert pipe.mesh is not None
    rs = np.random.RandomState(0)
    B = n
    img = rs.uniform(-1, 1, (B, 32, 32, 3)).astype(np.float32)
    sk = (rs.rand(B, 32, 32, 1) > 0.9).astype(np.float32)
    composed, mask = pipe(img, sk)
    assert composed.shape == (B, 32, 32, 3)
    assert mask.shape == (B, 32, 32, 1)

    # sharded result == single-device result
    opt.data_parallel = 1
    pipe1 = build_pipeline(opt)
    composed1, _ = pipe1(img, sk)
    np.testing.assert_allclose(composed, composed1, rtol=2e-5, atol=2e-5)


def test_testpy_mixed_native_sizes(tmp_path):
    """A directory of mixed non-/8 sizes completes end-to-end at native
    resolution (VERDICT r3 item 1) — the reference crashes on every one of
    these (editline_g.py:203-210 concat)."""
    imgs = tmp_path / "images"
    edges = tmp_path / "edges"
    imgs.mkdir()
    edges.mkdir()
    rs = np.random.RandomState(0)
    sizes = {"a": (36, 36), "b": (20, 28), "c": (44, 36)}
    for name, (h, w) in sizes.items():
        Image.fromarray(
            (rs.rand(h, w, 3) * 255).astype(np.uint8)).save(
            imgs / f"{name}.png")
        sk = np.zeros((h, w), np.uint8)
        sk[h // 4: h // 2, w // 2] = 255
        Image.fromarray(sk).save(edges / f"{name}.png")
    (tmp_path / "list.txt").write_text(
        "\n".join(f"{n}.png" for n in sizes) + "\n")

    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               SKETCHEDIT_CACHE_DIR=os.path.join(REPO, ".jax_cache"))
    cmd = [sys.executable, os.path.join(REPO, "test.py"),
           "--batchSize", "1", "--name", "clitest3",
           "--checkpoints_dir", str(tmp_path / "ckpt"),
           "--joint_train_inp", "--dataset_mode", "testimage",
           "--image_dirs", str(imgs), "--mask_dirs", str(edges),
           "--image_lists", str(tmp_path / "list.txt"),
           "--image_postfix", ".png", "--mask_postfix", ".png",
           "--pool_type", "max", "--use_cam",
           "--output_dir", str(out_dir)]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    for name, (h, w) in sizes.items():
        im = Image.open(out_dir / f"{name}.png")
        assert im.size == (w, h), (name, im.size)


def test_testpy_how_many_bounds_output(tiny_dataset, tmp_path):
    """--how_many truncates processing at the batch whose start index
    reaches the bound (test.py:27-30, reference test.py:21-23)."""
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               SKETCHEDIT_CACHE_DIR=os.path.join(REPO, ".jax_cache"))
    cmd = [sys.executable, os.path.join(REPO, "test.py"),
           "--batchSize", "1", "--name", "clitest2",
           "--checkpoints_dir", str(tmp_path / "ckpt"),
           "--joint_train_inp", "--dataset_mode", "testimage",
           "--image_dirs", str(tiny_dataset / "images"),
           "--mask_dirs", str(tiny_dataset / "edges"),
           "--image_lists", str(tiny_dataset / "list.txt"),
           "--image_postfix", ".png", "--mask_postfix", ".png",
           "--pool_type", "max", "--use_cam",
           "--how_many", "2", "--output_dir", str(out_dir)]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert sorted(os.listdir(out_dir)) == ["img0.png", "img1.png"]
