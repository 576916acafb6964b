"""Checkpoint, options, data-loader, and utility tests."""

import argparse
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path):
    from sketchedit_tpu.params import checkpoint as ckpt
    params = {"conv1": {"w": jnp.ones((3, 3, 4, 8)), "b": jnp.zeros((8,))},
              "conv2_downsample": {"w": jnp.full((3, 3, 4, 8), 2.0),
                                   "b": jnp.ones((8,))}}
    opt = argparse.Namespace(checkpoints_dir=str(tmp_path), name="t",
                             which_epoch="latest")
    ckpt.save_network(params, "G", 5, opt)
    # both the epoch file and the latest alias exist
    assert os.path.exists(tmp_path / "t" / "5_net_G.npz")
    assert os.path.exists(tmp_path / "t" / "latest_net_G.npz")
    loaded = ckpt.load_network("G", opt)
    for k in params:
        for leaf in params[k]:
            np.testing.assert_array_equal(loaded[k][leaf], params[k][leaf])


def test_checkpoint_ingests_torch_pth(tmp_path):
    import torch
    from sketchedit_tpu.params import checkpoint as ckpt
    os.makedirs(tmp_path / "t")
    state = {"module.conv1.weight": torch.randn(8, 4, 3, 3),
             "module.conv1.bias": torch.randn(8)}
    torch.save(state, tmp_path / "t" / "latest_net_M.pth")
    opt = argparse.Namespace(checkpoints_dir=str(tmp_path), name="t",
                             which_epoch="latest")
    loaded = ckpt.load_network("M", opt)
    assert loaded["conv1"]["w"].shape == (3, 3, 4, 8)
    np.testing.assert_allclose(
        np.asarray(loaded["conv1"]["w"]),
        state["module.conv1.weight"].numpy().transpose(2, 3, 1, 0))


def test_options_parse_and_snapshot(tmp_path, monkeypatch):
    import sys
    from sketchedit_tpu.options.test_options import TestOptions
    argv = ["prog", "--name", "t", "--dataset_mode", "base",
            "--checkpoints_dir", str(tmp_path),
            "--use_cam", "--pool_type", "max", "--joint_train_inp"]
    monkeypatch.setattr(sys, "argv", argv)
    opt = TestOptions().parse(save=True)
    assert opt.crop_size == 256 and not opt.isTrain
    assert opt.use_cam and opt.pool_type == "max"
    assert (tmp_path / "t" / "opt.txt").exists()
    assert (tmp_path / "t" / "opt.json").exists()


def test_train_options_parse_save_false_preserves_snapshot(
        tmp_path, monkeypatch):
    """parse(save=False) must not clobber an existing training run's
    opt.txt/opt.json: eval/tool scripts (scripts/mask_eval.py, the demo's
    render_grid) parse TrainOptions against the run directory with
    eval-time flags, and --load_from_opt_file later reads the snapshot
    back as training defaults."""
    import sys
    from sketchedit_tpu.options.train_options import TrainOptions
    base = ["prog", "--name", "t", "--checkpoints_dir", str(tmp_path),
            "--dataset_mode", "base", "--use_cam", "--pool_type", "max"]
    monkeypatch.setattr(sys, "argv", base + ["--batchSize", "16"])
    TrainOptions().parse()          # isTrain default: snapshot written
    snap = (tmp_path / "t" / "opt.txt").read_text()
    assert "batchSize: 16" in snap.replace(" ", " ")

    monkeypatch.setattr(sys, "argv", base + ["--batchSize", "1"])
    opt = TrainOptions().parse(save=False)
    assert opt.batchSize == 1
    assert (tmp_path / "t" / "opt.txt").read_text() == snap


def test_dataloader_pads_last_batch(tmp_path):
    from sketchedit_tpu.data import DataLoader

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {"image": np.full((4, 4, 3), i, np.float32),
                    "path": f"p{i}"}

    dl = DataLoader(DS(), batch_size=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[-1]["valid"] == 1
    assert batches[-1]["image"].shape == (2, 4, 4, 3)
    # threaded path yields the same data in order
    dl2 = DataLoader(DS(), batch_size=2, num_workers=2)
    batches2 = list(dl2)
    for a, b in zip(batches, batches2):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_mask_creator_shapes():
    from sketchedit_tpu.data.mask_creator import MaskCreator, external_mask
    mc = MaskCreator(rng=np.random.default_rng(0))
    m = mc.stroke_mask(64, 64, max_length=32)
    assert m.shape == (64, 64) and set(np.unique(m)).issubset({0.0, 1.0})
    r = mc.rectangle_mask(64, 64, 16, 32)
    assert r.sum() > 0
    e = external_mask(mc, 64, 64, use_object_masks=False)
    assert e.shape == (64, 64) and e.dtype == np.float32


def test_spatial_discount():
    from sketchedit_tpu.data.mask_creator import spatial_discount
    mask = np.zeros((16, 16))
    mask[4:12, 4:12] = 1.0
    d = spatial_discount(mask)
    assert d.shape == mask.shape
    assert d[8, 8] < d[4, 4]          # decays toward the hole center
    assert d[0, 0] == 0.0             # outside the mask


def test_labels_colormap():
    from sketchedit_tpu.utils.labels import labelcolormap, tensor2label
    cmap = labelcolormap(35)
    assert cmap.shape == (35, 3)
    # N==35 is the fixed Cityscapes table (reference util.py:239-245):
    # road / sidewalk / sky / person carry the canonical colors
    assert tuple(cmap[7]) == (128, 64, 128)
    assert tuple(cmap[8]) == (244, 35, 232)
    assert tuple(cmap[23]) == (70, 130, 180)
    assert tuple(cmap[24]) == (220, 20, 60)
    # other N use the bit-shuffling map with distinct colors
    cmap20 = labelcolormap(20)
    assert len({tuple(c) for c in cmap20}) == 20
    lab = np.zeros((8, 8), np.int64)
    lab[:4] = 1
    vis = tensor2label(lab, 35)
    assert vis.shape == (8, 8, 3)


def test_imaging_roundtrip(tmp_path):
    from sketchedit_tpu.utils.imaging import tensor2im, mask2im, save_image
    x = np.linspace(-1, 1, 48).reshape(4, 4, 3).astype(np.float32)
    u8 = tensor2im(x)
    assert u8.dtype == np.uint8 and u8.max() == 255 and u8.min() == 0
    m = mask2im(np.full((4, 4, 1), 0.5, np.float32))
    assert m.shape == (4, 4) and abs(int(m[0, 0]) - 127) <= 1
    save_image(u8, str(tmp_path / "x.png"))
    assert (tmp_path / "x.png").exists()


def test_iteration_counter(tmp_path):
    from sketchedit_tpu.utils.iter_counter import IterationCounter
    opt = argparse.Namespace(
        checkpoints_dir=str(tmp_path), name="t", niter=2, niter_decay=0,
        batchSize=2, isTrain=True, continue_train=False,
        save_epoch_freq=1, save_latest_freq=4, print_freq=4,
        display_freq=4)
    os.makedirs(tmp_path / "t")
    ic = IterationCounter(opt, dataset_size=6)
    assert list(ic.training_epochs()) == [1, 2]
    ic.record_epoch_start(1)
    ic.record_one_iteration()
    assert not ic.needs_printing()       # step 2: 2 % 4 >= batch
    ic.record_one_iteration()
    assert ic.needs_printing()           # step 4: 4 % 4 < batch
    ic.record_one_iteration()
    ic.record_current_iter()
    ic.record_epoch_end()
    # resume
    opt.continue_train = True
    ic2 = IterationCounter(opt, dataset_size=6)
    assert ic2.first_epoch == 2


def test_stage_timer():
    from sketchedit_tpu.utils.profiling import StageTimer
    t = StageTimer()
    with t.stage("a") as h:
        h["out"] = jnp.ones((4,))
    rep = t.report()
    assert "a" in rep


def test_iteration_counter_resume_phase_matches_reference(tmp_path):
    """Resume restarts the image total at (epoch-1)*dataset_size + images
    (reference util/iter_counter.py semantics) — with dataset_size not a
    multiple of batchSize, the steps*batch formula would drift the phase
    of every image-denominated periodic trigger."""
    import argparse
    from sketchedit_tpu.utils.iter_counter import IterationCounter
    ckdir = tmp_path / "t"
    ckdir.mkdir()
    (ckdir / "iter.txt").write_text("11\n0\n")
    opt = argparse.Namespace(
        batchSize=16, niter=20, niter_decay=0, save_latest_freq=5000,
        print_freq=100, display_freq=100, save_epoch_freq=10,
        checkpoints_dir=str(tmp_path), name="t", isTrain=True,
        continue_train=True)
    it = IterationCounter(opt, dataset_size=1000)
    assert it.first_epoch == 11
    assert it.total_steps_so_far == 10 * 1000     # not 10 * 62 * 16 = 9920
    it.record_epoch_start(11)
    it.record_one_iteration()
    assert it.total_steps_so_far == 10 * 1000 + 16


def test_create_dataloader_trainval(tmp_path):
    """Reference data/__init__.py:51-77 dual train/val loaders: train
    shuffles and drops the remainder, val is ordered and keeps it."""
    from PIL import Image
    from sketchedit_tpu.data import create_dataloader_trainval
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rs = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            imgs / f"{i}.png")
    opt = argparse.Namespace(
        isTrain=True, dataset_mode_train="editimage",
        dataset_mode_val="editimage", serial_batches=True, batchSize=2,
        nThreads=0, train_image_dir=str(imgs), train_image_list=None,
        preprocess_mode="resize_and_crop", load_size=32, crop_size=32,
        aspect_ratio=1.0, no_flip=True, not_om=True, cjit=None,
        canny_low=100, canny_high=200,
        path_objectshape_list=None, path_objectshape_base=None)
    train_dl, val_dl = create_dataloader_trainval(opt)
    train_batches = list(train_dl)
    val_batches = list(val_dl)
    assert len(train_batches) == 2          # drop_last: 5 // 2
    assert len(val_batches) == 3            # padded remainder kept
    assert train_batches[0]["image"].shape[0] == 2


def test_testimage_multi_dataset_semicolon_paths(tmp_path):
    """test.py's celeb+places joint runs: ';'-separated dirs/lists with
    per-dataset output labels (testimage_dataset.py:24-43)."""
    from PIL import Image
    from sketchedit_tpu.data.testimage import TestImageDataset
    for name in ("a", "b"):
        d = tmp_path / name
        (d / "images").mkdir(parents=True)
        (d / "edges").mkdir()
        rs = np.random.RandomState(0)
        Image.fromarray((rs.rand(16, 16, 3) * 255).astype(np.uint8)).save(
            d / "images" / "x.png")
        Image.fromarray(
            ((rs.rand(16, 16) > 0.9) * 255).astype(np.uint8)).save(
            d / "edges" / "x.png")
        (d / "list.txt").write_text("x.png\n")
    opt = argparse.Namespace(
        image_dirs=f"{tmp_path}/a/images;{tmp_path}/b/images",
        mask_dirs=f"{tmp_path}/a/edges;{tmp_path}/b/edges",
        image_lists=f"{tmp_path}/a/list.txt;{tmp_path}/b/list.txt",
        image_postfix=".png", mask_postfix=".png",
        output_labels="celeb;places",
        output_dir=str(tmp_path), output_mask_dir=None)
    ds = TestImageDataset()
    ds.initialize(opt)
    assert len(ds) == 2
    assert ds[0]["path"] == "celeb_x.png"
    assert ds[1]["path"] == "places_x.png"
    assert ds[1]["image"].shape == (16, 16, 3)


def test_object_mask_and_shadow(tmp_path):
    """The object-shape branch (mask_creator.py:86-133): load a shape from
    the configured list, scale/crop/place it, and derive the shadow pair
    (blurred mask + dilated expansion)."""
    from PIL import Image
    from sketchedit_tpu.data.mask_creator import MaskCreator, external_mask
    shapes = tmp_path / "shapes"
    shapes.mkdir()
    for i in range(2):
        m = np.zeros((40, 40), np.uint8)
        m[8 + i:32, 8:32 - i] = 255
        Image.fromarray(m).save(shapes / f"s{i}.png")
    (tmp_path / "list.txt").write_text("s0.png\ns1.png\n")

    mc = MaskCreator(str(tmp_path / "list.txt"), str(shapes),
                     rng=np.random.default_rng(3))
    om = mc.object_mask(64, 64)
    assert om.shape == (64, 64)
    assert set(np.unique(om)).issubset({0.0, 1.0}) and om.sum() > 0

    shadow, expand = mc.object_shadow(64, 64)
    assert shadow.shape == (64, 64) and expand.shape == (64, 64)
    # the dilated expansion covers at least the object's support
    om2 = (shadow < 0.99).astype(np.float64)
    assert expand.sum() >= om2.sum() > 0

    e = external_mask(mc, 64, 64, use_object_masks=True)
    assert e.shape == (64, 64) and e.dtype == np.float32 and e.sum() > 0


def test_editimage_with_object_masks(tmp_path):
    """Full object-mask training data path: editimage with a configured
    shape list (--not_om off) draws object-mask edit regions."""
    from PIL import Image
    from sketchedit_tpu.data.editimage import EditImageDataset
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    shapes = tmp_path / "shapes"
    shapes.mkdir()
    rs = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            imgs / f"{i}.png")
        m = np.zeros((40, 40), np.uint8)
        m[8:32, 8:32] = 255
        Image.fromarray(m).save(shapes / f"s{i}.png")
    (tmp_path / "list.txt").write_text("s0.png\ns1.png\n")

    opt = argparse.Namespace(
        preprocess_mode='resize_and_crop', load_size=64, crop_size=64,
        isTrain=True, no_flip=True, cjit=None,
        train_image_dir=str(imgs), train_image_list=None,
        canny_low=100, canny_high=200, not_om=False,
        path_objectshape_list=str(tmp_path / "list.txt"),
        path_objectshape_base=str(shapes))
    ds = EditImageDataset()
    ds.initialize(opt, seed=11)
    item = ds[0]
    for k in ("mask", "random_mask", "random_mask2", "region_gt"):
        assert item[k].shape[:2] == (64, 64)
        assert item[k].sum() >= 0
    assert item["random_mask"].sum() > 0
    # the partial sketch is exactly the edges inside the GT region — the
    # invariant --lambda_mask_rec supervision relies on
    assert item["region_gt"].dtype == bool and item["region_gt"].sum() > 0
    np.testing.assert_array_equal(
        item["mask"], item["edgegt"] & item["region_gt"])


def test_load_from_opt_file_restores_flags(tmp_path, monkeypatch):
    """--load_from_opt_file re-applies the snapshotted flag values as
    defaults (base_options.py:121-154) — only for REGISTERED flags
    (namespace-only snapshot keys like isTrain must not be injected)."""
    import sys as _sys
    import json
    from sketchedit_tpu.options.test_options import TestOptions
    save_argv = ["prog", "--name", "t", "--dataset_mode", "base",
                 "--checkpoints_dir", str(tmp_path),
                 "--pool_type", "max", "--use_cam", "--joint_train_inp",
                 "--crop_size", "128"]
    monkeypatch.setattr(_sys, "argv", save_argv)
    TestOptions().parse(save=True)
    # poison the snapshot with a namespace-only key
    snap = tmp_path / "t" / "opt.json"
    data = json.loads(snap.read_text())
    assert data["crop_size"] == 128 and "isTrain" in data
    data["bogus_unregistered_key"] = 42
    snap.write_text(json.dumps(data))

    load_argv = ["prog", "--name", "t", "--dataset_mode", "base",
                 "--checkpoints_dir", str(tmp_path),
                 "--load_from_opt_file"]
    monkeypatch.setattr(_sys, "argv", load_argv)
    opt = TestOptions().parse()
    assert opt.crop_size == 128            # restored from the snapshot
    assert opt.pool_type == "max" and opt.use_cam
    assert not hasattr(opt, "bogus_unregistered_key")
    assert not opt.isTrain                 # phase comes from THIS parser
