"""Image-quality metrics (PSNR / SSIM / masked L1) as pure jittable fns.

The reference repo ships no quantitative eval for edit quality (its
test.py only writes PNGs — /root/reference/test.py:20-40); inpainting
papers report PSNR/SSIM/L1 over the reconstruction, so this module
provides them TPU-side: every metric is a pure function over device
arrays, reduces on device, and returns per-image scalars (fetch one
small vector per batch instead of streaming full images to the host).

SSIM follows Wang et al. 2004 as implemented by the canonical MATLAB
code: 11x11 Gaussian window (sigma 1.5, normalized), K1=0.01, K2=0.03,
VALID convolution (no padding — border pixels with incomplete windows
are excluded), per-channel maps averaged over channels and space.
``tests/test_metrics.py`` pins it against an independent numpy oracle.

All inputs are NHWC. ``data_range`` defaults to 2.0 (images in [-1, 1],
the repo-wide convention — models/editline2.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _f32(x):
    return jnp.asarray(x).astype(jnp.float32)


def psnr(a, b, *, data_range: float = 2.0):
    """Peak signal-to-noise ratio per image: (B,H,W,C)x2 -> (B,)."""
    a, b = _f32(a), _f32(b)
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range * data_range / jnp.maximum(mse, 1e-12))


def masked_psnr(a, b, mask, *, data_range: float = 2.0):
    """PSNR restricted to mask>0.5 pixels: mask (B,H,W,1) -> (B,).

    Images whose mask is empty return +inf-free 0-MSE PSNR clamped by the
    1e-12 floor; callers should filter on mask area if that matters.
    """
    a, b, m = _f32(a), _f32(b), (_f32(mask) > 0.5).astype(jnp.float32)
    # m (B,H,W,1) broadcasts over C; element count is pixel-count x C
    se = jnp.sum(jnp.square(a - b) * m, axis=(1, 2, 3))
    n = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1.0) * a.shape[-1]
    mse = se / n
    return 10.0 * jnp.log10(data_range * data_range / jnp.maximum(mse, 1e-12))


def masked_l1(a, b, mask):
    """Mean |a-b| over mask>0.5 pixels: -> (B,)."""
    a, b, m = _f32(a), _f32(b), (_f32(mask) > 0.5).astype(jnp.float32)
    num = jnp.sum(jnp.abs(a - b) * m, axis=(1, 2, 3))
    den = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)) * a.shape[-1], 1.0)
    return num / den


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    half = (size - 1) / 2.0
    x = np.arange(size, dtype=np.float64) - half
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def _filter(x, win):
    """Depthwise VALID 2-D correlation: (B,H,W,C) -> (B,H',W',C)."""
    c = x.shape[-1]
    k = jnp.asarray(win)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def ssim(a, b, *, data_range: float = 2.0, window_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Structural similarity per image: (B,H,W,C)x2 -> (B,) in [-1, 1]."""
    a, b = _f32(a), _f32(b)
    if a.shape[1] < window_size or a.shape[2] < window_size:
        raise ValueError(
            f"ssim needs H,W >= {window_size}, got {a.shape[1:3]}")
    win = _gaussian_window(window_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _filter(a, win)
    mu_b = _filter(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # E[x^2] - E[x]^2; VALID windows so every tap is in-bounds
    s_aa = _filter(a * a, win) - mu_aa
    s_bb = _filter(b * b, win) - mu_bb
    s_ab = _filter(a * b, win) - mu_ab
    num = (2.0 * mu_ab + c1) * (2.0 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
