"""Image-space ops: resize, pooling, blur. NHWC, pure jnp/lax.

These replicate the exact numerics the reference reaches through
torch.nn.functional (interpolate-nearest, avg_pool2d, max_pool2d) so the
model graphs agree to float tolerance.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def nearest_upsample2x(x):
    """x2 nearest upsample == torch F.interpolate(scale_factor=2)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def nearest_resize(x, out_hw):
    """Nearest resize to (H, W) == torch F.interpolate(mode='nearest').

    torch maps output index i to input index floor(i * in / out).
    """
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw
    rows = (jnp.arange(oh) * H) // oh
    cols = (jnp.arange(ow) * W) // ow
    return x[:, rows][:, :, cols]


def avg_pool2d(x, window: int, stride: int | None = None):
    """Non-overlapping/strided average pool, VALID padding (torch default)."""
    stride = stride or window
    s = lax.reduce_window(
        x, 0.0, lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")
    return s / float(window * window)


def max_pool2d(x, window, stride: int | None = None):
    """Max pool; `window` may be an (h, w) tuple for global pooling."""
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, window[0], window[1], 1), (1, stride[0], stride[1], 1), "VALID")


def _gaussian_kernel1d_grid(kernel_size: int, sigma: float):
    """2-D gaussian grid normalized to sum 1 (reference get_gaussian_kernel,
    editline2_model.py:13-46)."""
    coords = jnp.arange(kernel_size, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(coords, coords, indexing="xy")
    mean = (kernel_size - 1) / 2.0
    var = sigma ** 2
    g = (1.0 / (2.0 * math.pi * var)) * jnp.exp(
        -((xg - mean) ** 2 + (yg - mean) ** 2) / (2 * var))
    return g / jnp.sum(g)


def gaussian_blur3x3(x, sigma: float = 2.0):
    """Depthwise 3x3 gaussian blur with replicate padding.

    Matches the reference's fixed blur filter (kernel_size=3, sigma=2,
    padding_mode='replicate') used by the --filt_maskim training loss.
    """
    k = _gaussian_kernel1d_grid(3, sigma).astype(x.dtype)
    C = x.shape[-1]
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # HWIO with I/groups=1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    ).astype(x.dtype)
