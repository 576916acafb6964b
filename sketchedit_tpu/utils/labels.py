"""Semantic-label visualization utilities (reference util/util.py:233-293:
labelcolormap / Colorize / tensor2label).

PARITY-ONLY DEAD CODE, by design: the reference carries these SPADE-era
helpers with no caller on its edit path either; they are kept solely so a
user porting tooling that imports them finds the same surface (C11
inventory row). No runtime path in this repo consumes this module — its
only coverage is tests/test_io.py pinning the palette/colorize math.
If the reference surface ever drops them, delete this file."""

from __future__ import annotations

import numpy as np


def _uint8_bits(n, i):
    return (n >> i) & 1


# the standard Cityscapes class palette (reference util.py:239-245 returns
# this fixed table for N==35, which is Colorize's default)
_CITYSCAPES_35 = np.array(
    [(0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0),
     (111, 74, 0), (81, 0, 81), (128, 64, 128), (244, 35, 232),
     (250, 170, 160), (230, 150, 140), (70, 70, 70), (102, 102, 156),
     (190, 153, 153), (180, 165, 180), (150, 100, 100), (150, 120, 90),
     (153, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
     (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
     (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 0, 90),
     (0, 0, 110), (0, 80, 100), (0, 0, 230), (119, 11, 32), (0, 0, 142)],
    dtype=np.uint8)


def labelcolormap(N: int) -> np.ndarray:
    """The standard PASCAL-style bit-shuffling colormap, (N, 3) uint8;
    N==35 returns the fixed Cityscapes palette like the reference.
    (The reference's N==182 COCO name-keyed overrides need its bundled
    coco label table and are intentionally not reproduced.)"""
    if N == 35:
        return _CITYSCAPES_35.copy()
    cmap = np.zeros((N, 3), dtype=np.uint8)
    for i in range(N):
        r = g = b = 0
        idx = i + 1
        for j in range(8):
            r = r | (_uint8_bits(idx, 0) << (7 - j))
            g = g | (_uint8_bits(idx, 1) << (7 - j))
            b = b | (_uint8_bits(idx, 2) << (7 - j))
            idx >>= 3
        cmap[i] = (r, g, b)
    return cmap


class Colorize:
    def __init__(self, n: int = 35):
        self.cmap = labelcolormap(n)

    def __call__(self, label_hw: np.ndarray) -> np.ndarray:
        """(H, W) int labels -> (H, W, 3) uint8 color image."""
        label_hw = np.asarray(label_hw)
        out = np.zeros(label_hw.shape + (3,), np.uint8)
        for i in range(len(self.cmap)):
            out[label_hw == i] = self.cmap[i]
        return out


def tensor2label(label, n_label: int):
    """(H, W) or (C, H, W)/(H, W, C) label array -> color visualization."""
    label = np.asarray(label)
    if label.ndim == 3:
        # one-hot or channel dim -> argmax over the channel axis
        ch_axis = 0 if label.shape[0] <= label.shape[-1] else -1
        if label.shape[ch_axis] > 1:
            label = label.argmax(ch_axis)
        else:
            label = np.squeeze(label, ch_axis)
    return Colorize(n_label)(label.astype(np.int64))
