"""Array <-> image utilities (reference util/util.py:35-133 equivalents,
NHWC-native)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def tensor2im(arr, *, imtype=np.uint8):
    """(H,W,C) or (B,H,W,C) float in [-1,1] -> uint8 RGB [0,255]."""
    arr = np.asarray(arr, dtype=np.float32)
    out = (np.clip(arr, -1.0, 1.0) + 1.0) / 2.0 * 255.0
    return out.astype(imtype)


def mask2im(arr, *, imtype=np.uint8):
    """(H,W,1)/(B,H,W,1) float in [0,1] -> uint8 grayscale."""
    arr = np.asarray(arr, dtype=np.float32)
    out = np.clip(arr, 0.0, 1.0) * 255.0
    return np.squeeze(out, axis=-1).astype(imtype)


def save_image(image_np: np.ndarray, path: str, create_dir: bool = False):
    if create_dir:
        os.makedirs(os.path.dirname(path), exist_ok=True)
    if image_np.ndim == 3 and image_np.shape[2] == 1:
        image_np = image_np[:, :, 0]
    Image.fromarray(image_np).save(path)


def tile_images(imgs: np.ndarray, picturesPerRow: int = 4) -> np.ndarray:
    """(N,H,W,C) -> one tiled grid image, padding the last row."""
    n = imgs.shape[0]
    rem = n % picturesPerRow
    if rem:
        pad = np.zeros((picturesPerRow - rem,) + imgs.shape[1:], imgs.dtype)
        imgs = np.concatenate([imgs, pad])
    rows = [np.concatenate(list(imgs[i:i + picturesPerRow]), axis=1)
            for i in range(0, imgs.shape[0], picturesPerRow)]
    return np.concatenate(rows, axis=0)


def natural_sort(items):
    import re

    def key(text):
        return [int(c) if c.isdigit() else c.lower()
                for c in re.split(r'(\d+)', text)]
    return sorted(items, key=key)


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ('yes', 'true', 't', 'y', '1'):
        return True
    if v.lower() in ('no', 'false', 'f', 'n', '0'):
        return False
    raise ValueError(f'Boolean value expected, got {v!r}')
