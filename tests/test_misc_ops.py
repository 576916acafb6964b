"""Coverage for the remaining ops: gaussian blur (vs torch), nearest
resize, attention mask-recon, loss arithmetic."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sketchedit_tpu.ops.image import (
    gaussian_blur3x3, nearest_resize, nearest_upsample2x)
from torch_oracle import to_nchw, to_nhwc


def test_gaussian_blur_matches_reference_filter():
    """The fixed 3x3 sigma=2 depthwise blur with replicate padding
    (editline2_model.py get_gaussian_kernel, used by --filt_maskim)."""
    import math
    ks, sigma = 3, 2.0
    coords = np.arange(ks, dtype=np.float64)
    xg, yg = np.meshgrid(coords, coords)
    mean, var = (ks - 1) / 2.0, sigma ** 2
    g = np.exp(-((xg - mean) ** 2 + (yg - mean) ** 2) / (2 * var)) / (
        2 * math.pi * var)
    g = (g / g.sum()).astype(np.float32)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 9, 11, 3).astype(np.float32)
    got = np.asarray(gaussian_blur3x3(jnp.asarray(x)))

    w = torch.from_numpy(np.tile(g[None, None], (3, 1, 1, 1)))
    xt = F.pad(to_nchw(x), (1, 1, 1, 1), mode="replicate")
    want = to_nhwc(F.conv2d(xt, w, groups=3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nearest_resize_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 4, 6, 2).astype(np.float32)
    got = np.asarray(nearest_resize(jnp.asarray(x), (8, 9)))
    want = to_nhwc(F.interpolate(to_nchw(x), size=(8, 9), mode="nearest"))
    np.testing.assert_allclose(got, want)


def test_nearest_upsample_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.randn(1, 3, 5, 2).astype(np.float32)
    got = np.asarray(nearest_upsample2x(jnp.asarray(x)))
    want = to_nhwc(F.interpolate(to_nchw(x), scale_factor=2))
    np.testing.assert_allclose(got, want)


def test_attention_mask_recon_normalized():
    """The auxiliary hole-mask reconstruction divides by the overlap map
    (splitcam.py:155-160) — unlike the main output."""
    from sketchedit_tpu.ops.attention import (
        contextual_attention, attention_mask_recon)
    rs = np.random.RandomState(3)
    H, C = 8, 4
    f = jnp.asarray(rs.randn(1, H, H, C).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, H, H, 1) > 0.5).astype(np.float32))
    _, w = contextual_attention(f, f, mask, return_weights=True)
    recon = attention_mask_recon(w, mask, (H, H))
    assert recon.shape == (1, H, H, 1)
    # uniform weights over a constant mask reconstruct values in [0, 1]
    r = np.asarray(recon)
    assert r.min() >= -1e-5 and r.max() <= 1 + 1e-5


def test_g_image_loss_arithmetic():
    """L1 terms combine per editline2_model.py:286-299 (coarse+fake at
    lambda_l1, mask-image terms at lambda_l1_mask, twice when not
    train_maskim)."""
    from sketchedit_tpu.train.trainer import TrainConfig, g_image_loss
    B, H = 1, 8
    rs = np.random.RandomState(4)
    gen = {
        "coarse": jnp.zeros((B, H, H, 3)),
        "fake": jnp.zeros((B, H, H, 3)),
        "mask_image": jnp.zeros((B, H, H, 3)),
        "mask": jnp.full((B, H, H, 1), 0.5),
        "mask_inpaint": jnp.ones((B, H, H, 1)),
        "line_inpaint": jnp.zeros((B, H, H, 1)),
        "input_inpaint": jnp.zeros((B, H, H, 3)),
    }
    batch = {"image": jnp.zeros((B, H, H, 3)),
             "gt": jnp.full((B, H, H, 3), 0.5)}
    cfg = TrainConfig(no_gan_loss=True, no_vgg_loss=True,
                      lambda_l1=2.0, lambda_l1_mask=3.0)
    G = g_image_loss(None, gen, batch, cfg)
    # coarse L1 = 0.5*2; fake L1 = 0.5*2 (update_part=all)
    np.testing.assert_allclose(float(G["L1f"]), 1.0)
    # L1c = coarse(1.0) + maskim(0.5*3) + blur-composite term:
    # com = maskim*mask + inputs*(1-mask) = 0 -> another 0.5*3
    np.testing.assert_allclose(float(G["L1c"]), 1.0 + 1.5 + 1.5)
