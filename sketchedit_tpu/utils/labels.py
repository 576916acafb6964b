"""Semantic-label visualization utilities (reference util/util.py:233-293:
labelcolormap / Colorize / tensor2label — SPADE legacy kept for surface
completeness; unused on the edit path)."""

from __future__ import annotations

import numpy as np


def _uint8_bits(n, i):
    return (n >> i) & 1


def labelcolormap(N: int) -> np.ndarray:
    """The standard PASCAL-style bit-shuffling colormap, (N, 3) uint8."""
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
