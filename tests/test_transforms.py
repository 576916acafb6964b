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
