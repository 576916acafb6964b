"""Decoded-frame cache + spawned process-pool loader determinism.

The r3 real-train measurement showed zero loader headroom at 512^2 on a
busy host; round 4 buys it by caching the deterministic decode+resize
stage across epochs (editimage._resized_u8) and proving the process-pool
path (clamped off on 1-core hosts) under SKETCHEDIT_FORCE_PROCESS_WORKERS.
"""

import argparse
import os

import numpy as np
import pytest
from PIL import Image

from sketchedit_tpu.data import DataLoader
from sketchedit_tpu.data.editimage import EditImageDataset


def _make_images(tmp_path, n=8, size=40):
    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(
            (rs.rand(size, size, 3) * 255).astype(np.uint8)).save(
            d / f"{i}.png")
    return str(d)


def _opt(img_dir, cache_mb, load=32, crop=32):
    return argparse.Namespace(
        train_image_dir=img_dir, train_image_list=None,
        canny_low=100, canny_high=200, preprocess_mode='resize_and_crop',
        load_size=load, crop_size=crop, no_flip=False, isTrain=True,
        not_om=True, cache_filelist_read=False, cache_filelist_write=False,
        max_dataset_size=None, decode_cache_mb=cache_mb)


def _collect(ds, epochs=2, n=8):
    """Two epochs of items under per-item reseeding (the process-worker
    protocol, also what makes draws order-independent)."""
    out = []
    for ep in range(epochs):
        for i in range(n):
            ds.reseed((0, ep, i))
            out.append(ds[i])
    return out


def test_decode_cache_is_transparent(tmp_path):
    d = _make_images(tmp_path)
    ds_on = EditImageDataset()
    ds_on.initialize(_opt(d, cache_mb=64))
    ds_off = EditImageDataset()
    ds_off.initialize(_opt(d, cache_mb=0))

    a = _collect(ds_on)
    b = _collect(ds_off)
    assert ds_on._cache_bytes > 0 and not ds_off._cache
    for ia, ib in zip(a, b):
        for k in ('image_u8', 'mask', 'edgegt', 'region_gt',
                  'random_mask', 'random_mask2'):
            np.testing.assert_array_equal(ia[k], ib[k], err_msg=k)


def test_decode_cache_respects_byte_cap(tmp_path):
    d = _make_images(tmp_path, n=8, size=40)
    ds = EditImageDataset()
    # 40*40*3 = 4800 B/frame; cap 0 MB disables outright
    ds.initialize(_opt(d, cache_mb=0))
    _ = [ds[i] for i in range(8)]
    assert ds._cache_bytes == 0 and not ds._cache


def test_random_crop_uses_cached_frame(tmp_path):
    """load_size > crop_size: crops from the cached resized frame match
    the frame's pixels at the drawn offset (the numpy crop path)."""
    d = _make_images(tmp_path, n=2, size=48)
    ds = EditImageDataset()
    ds.initialize(_opt(d, cache_mb=64, load=48, crop=32))
    ds.reseed((0, 0, 0))
    item = ds[0]
    frame = ds._cache[0]
    img = item['image_u8']
    assert img.shape == (32, 32, 3)
    # the crop must be a contiguous window of the frame (possibly flipped)
    found = any(
        np.array_equal(img, cand) or np.array_equal(img, cand[:, ::-1])
        for y in range(48 - 32 + 1) for x in range(48 - 32 + 1)
        for cand in (frame[y:y + 32, x:x + 32],))
    assert found


@pytest.mark.skipif(os.environ.get("SKETCHEDIT_SKIP_SLOW") == "1",
                    reason="spawn pools are slow")
def test_process_pool_determinism(tmp_path):
    """Forced spawn-pool loading must produce batches identical across
    worker counts and identical to the reseeded serial path — augmentation
    draws are a function of (seed, epoch, index), not of scheduling."""
    d = _make_images(tmp_path)
    env_key = "SKETCHEDIT_FORCE_PROCESS_WORKERS"
    old = os.environ.get(env_key)
    os.environ[env_key] = "1"
    try:
        def run(workers):
            ds = EditImageDataset()
            ds.initialize(_opt(d, cache_mb=64))
            dl = DataLoader(ds, batch_size=4, shuffle=True,
                            num_workers=workers, drop_last=True, seed=0,
                            compact=True)
            batches = [b for b in dl]
            dl.close()
            return batches

        b2 = run(2)
        b3 = run(3)
        assert len(b2) == len(b3) == 2
        for x, y in zip(b2, b3):
            assert x['path'] == y['path']
            for k in ('image', 'mask', 'edgegt', 'random_mask'):
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)
    finally:
        if old is None:
            os.environ.pop(env_key, None)
        else:
            os.environ[env_key] = old


def test_worker_init_splits_decode_cache_budget():
    """--decode_cache_mb is a TOTAL budget: each spawned worker sees an
    arbitrary item subset, so _worker_init must divide the cap by the
    worker count (else loader RSS = workers x cap on multi-core hosts)."""
    from sketchedit_tpu.data import _worker_init, _WORKER_STATE

    class _DS:
        _cache_cap = 512 << 20

    ds = _DS()
    _worker_init(ds, 0, 4)
    assert ds._cache_cap == (512 << 20) // 4
    ds2 = _DS()
    _worker_init(ds2, 0, 1)                 # single worker: untouched
    assert ds2._cache_cap == 512 << 20
    _WORKER_STATE.clear()
