"""Preprocess-mode vocabulary tests (reference base_dataset.py semantics)."""

import argparse

import numpy as np
import pytest
from PIL import Image

from sketchedit_tpu.data.transforms import (
    get_params, apply_transform, image_to_array, binarize_sketch)


def _opt(mode, load=32, crop=16, aspect=1.0, is_train=False, no_flip=True):
    return argparse.Namespace(
        preprocess_mode=mode, load_size=load, crop_size=crop,
        aspect_ratio=aspect, isTrain=is_train, no_flip=no_flip)


def _img(w, h, seed=0):
    rs = np.random.RandomState(seed)
    return Image.fromarray((rs.rand(h, w, 3) * 255).astype(np.uint8))


def test_resize_and_crop():
    opt = _opt('resize_and_crop')
    rng = np.random.default_rng(0)
    params = get_params(opt, (64, 48), rng)
    out = apply_transform(opt, _img(64, 48), params)
    assert out.size == (16, 16)


def test_scale_width_preserves_aspect():
    opt = _opt('scale_width')
    params = get_params(opt, (64, 48), np.random.default_rng(0))
    out = apply_transform(opt, _img(64, 48), params)
    assert out.size == (32, 24)


def test_scale_shortside():
    """Reference quirk (base_dataset.py __scale_shortside): the LONG side is
    rescaled to target*ls/ss but the short side keeps its original size —
    reproduced faithfully."""
    opt = _opt('scale_shortside')
    params = get_params(opt, (64, 48), np.random.default_rng(0))
    out = apply_transform(opt, _img(64, 48), params)
    assert out.size == (int(32 * 64 / 48), 48)


def test_none_rounds_to_32():
    opt = _opt('none')
    params = get_params(opt, (70, 40), np.random.default_rng(0))
    out = apply_transform(opt, _img(70, 40), params)
    assert out.size == (64, 32)


def test_fixed_uses_aspect_ratio():
    opt = _opt('fixed', crop=20, aspect=2.0)
    params = get_params(opt, (64, 48), np.random.default_rng(0))
    out = apply_transform(opt, _img(64, 48), params)
    assert out.size == (20, 10)


def test_paired_transforms_share_params():
    """Image and sketch must get the same crop/flip (the reference's
    shared-seed trick, base_dataset.py:77-85)."""
    opt = _opt('resize_and_crop', load=32, crop=16, is_train=True,
               no_flip=False)
    params = get_params(opt, (64, 64), np.random.default_rng(3))
    a = apply_transform(opt, _img(64, 64, seed=1), params)
    b = apply_transform(opt, _img(64, 64, seed=1), params)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_image_to_array_normalization():
    arr = image_to_array(_img(8, 8))
    assert arr.shape == (8, 8, 3)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    raw = np.asarray(_img(8, 8), np.float32)
    np.testing.assert_allclose(arr, (raw / 255.0 - 0.5) / 0.5, atol=1e-6)


def test_binarize_sketch_resizes_to_image():
    sk = Image.new("L", (10, 10), 0)
    sk.putpixel((5, 5), 200)
    out = binarize_sketch(sk, (20, 20))
    assert out.shape == (20, 20, 1)
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_color_jitter_params_drawn_only_at_train():
    from sketchedit_tpu.data.transforms import get_params
    base = dict(preprocess_mode='resize_and_crop', load_size=32,
                crop_size=32)
    rng = np.random.default_rng(0)
    opt_train = argparse.Namespace(**base, isTrain=True, cjit=0.3)
    opt_test = argparse.Namespace(**base, isTrain=False, cjit=0.3)
    opt_nocj = argparse.Namespace(**base, isTrain=True, cjit=None)
    assert get_params(opt_train, (64, 64), rng).jitter is not None
    assert get_params(opt_test, (64, 64), rng).jitter is None
    assert get_params(opt_nocj, (64, 64), rng).jitter is None
    order, (b, c, s, h) = get_params(opt_train, (64, 64), rng).jitter
    assert sorted(order) == [0, 1, 2, 3]
    for f in (b, c, s):
        assert 0.7 - 1e-9 <= f <= 1.3 + 1e-9   # U[1-c, 1+c]
    assert -0.3 <= h <= 0.3


def test_color_jitter_brightness_scales_pixels():
    from sketchedit_tpu.data.transforms import color_jitter
    img = Image.fromarray(np.full((8, 8, 3), 100, np.uint8))
    out = color_jitter(img, ((0,), (0.5, 1.0, 1.0, 0.0)))
    np.testing.assert_allclose(np.asarray(out), 50, atol=1)
    # identity factors are a no-op
    out2 = color_jitter(img, ((0, 1, 2, 3), (1.0, 1.0, 1.0, 0.0)))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(img))


def test_editimage_cjit_changes_image_not_edges(tmp_path):
    pytest.importorskip("cv2")
    from sketchedit_tpu.data.editimage import EditImageDataset
    rs = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"{i}.png")

    def make(cjit):
        opt = argparse.Namespace(
            preprocess_mode='resize_and_crop', load_size=64, crop_size=64,
            isTrain=True, no_flip=True, cjit=cjit,
            train_image_dir=str(tmp_path), train_image_list=None,
            canny_low=100, canny_high=200, not_om=True,
            path_objectshape_list=None, path_objectshape_base=None)
        ds = EditImageDataset()
        ds.initialize(opt, seed=7)
        return ds[0]

    plain, jittered = make(None), make(0.5)
    # geometry params are drawn before the jitter factors, so the crop —
    # and with it the edge map — is identical; the sketch region differs
    # (jitter draws consume RNG) but stays a subset of the edges; only the
    # photometric channels move
    np.testing.assert_array_equal(plain['edgegt'], jittered['edgegt'])
    assert np.all(jittered['mask'] <= jittered['edgegt'])
    di = (plain['image_u8'].astype(np.int16)
          - jittered['image_u8'].astype(np.int16))
    assert np.abs(di).max() > 2


def test_scale_width_and_crop_and_shortside_and_crop():
    """The two *_and_crop modes: scaled dims follow the reference formulas
    and the crop lands inside them."""
    opt = _opt('scale_width_and_crop', load=32, crop=16)
    rng = np.random.default_rng(0)
    params = get_params(opt, (64, 48), rng)   # w,h -> new (32, 24)
    out = apply_transform(opt, _img(64, 48), params)
    assert out.size == (16, 16)

    opt = _opt('scale_shortside_and_crop', load=32, crop=16)
    params = get_params(opt, (64, 48), rng)   # shortside quirk: ss stays
    out = apply_transform(opt, _img(64, 48), params)
    assert out.size == (16, 16)


def test_crop_positions_reach_the_right_bottom_edge():
    """Reference random.randint is INCLUSIVE of new_dim - crop_size: the
    right/bottom-most crop must be reachable (the exclusive-bound bug
    silently biased every *_and_crop augmentation)."""
    opt = _opt('resize_and_crop', load=32, crop=16)
    rng = np.random.default_rng(0)
    xs, ys = set(), set()
    for _ in range(400):
        p = get_params(opt, (64, 64), rng)
        x, y = p.crop_pos
        xs.add(x)
        ys.add(y)
    assert max(xs) == 32 - 16 and max(ys) == 32 - 16
    assert min(xs) == 0 and min(ys) == 0


def test_shortside_crop_params_from_resized_frame():
    """Regression: the cached-decode path feeds get_params the ALREADY
    resized frame size. For scale_shortside_and_crop the new_size
    recomputation is NOT idempotent (the shortside quirk rescales the
    long side again), so without size_is_resized crop positions were
    drawn past the frame edge -> zero-padded (mostly black) crops."""
    from sketchedit_tpu.data.transforms import apply_resize
    opt = _opt('scale_shortside_and_crop', load=200, crop=64)
    frame = apply_resize(opt, _img(100, 80))          # quirk: -> (250, 80)
    assert frame.size == (250, 80)

    rng = np.random.default_rng(0)
    xs = set()
    for _ in range(600):
        p = get_params(opt, frame.size, rng, size_is_resized=True)
        assert p.new_size == (250, 80)
        x, y = p.crop_pos
        xs.add(x)
        assert 0 <= x <= 250 - 64 and 0 <= y <= 80 - 64
    assert max(xs) == 250 - 64                        # full range reachable

    # equivalence with the reference draw (original size, recomputed):
    # same bounds -> identical distribution
    p_ref = get_params(opt, (100, 80), np.random.default_rng(7))
    p_new = get_params(opt, frame.size, np.random.default_rng(7),
                       size_is_resized=True)
    assert p_ref.new_size == p_new.new_size == (250, 80)
    assert p_ref.crop_pos == p_new.crop_pos and p_ref.flip == p_new.flip
