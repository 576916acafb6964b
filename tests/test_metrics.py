"""utils/metrics.py vs an independent numpy oracle.

The numpy SSIM below is a direct sliding-window transcription of Wang et
al. 2004 (explicit per-window loops, no conv machinery shared with the
JAX implementation), so agreement is a real cross-check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sketchedit_tpu.utils import metrics


def _np_gaussian(size, sigma):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x * x) / (2 * sigma * sigma))
    w = np.outer(g, g)
    return w / w.sum()


def _np_ssim_single(a, b, data_range, size=11, sigma=1.5):
    """SSIM for one (H, W) channel via explicit window loops."""
    win = _np_gaussian(size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    H, W = a.shape
    vals = []
    for i in range(H - size + 1):
        for j in range(W - size + 1):
            pa = a[i:i + size, j:j + size]
            pb = b[i:i + size, j:j + size]
            mu_a = (win * pa).sum()
            mu_b = (win * pb).sum()
            s_aa = (win * pa * pa).sum() - mu_a * mu_a
            s_bb = (win * pb * pb).sum() - mu_b * mu_b
            s_ab = (win * pa * pb).sum() - mu_a * mu_b
            num = (2 * mu_a * mu_b + c1) * (2 * s_ab + c2)
            den = (mu_a ** 2 + mu_b ** 2 + c1) * (s_aa + s_bb + c2)
            vals.append(num / den)
    return float(np.mean(vals))


def test_ssim_matches_numpy_oracle():
    rs = np.random.RandomState(0)
    a = rs.uniform(-1, 1, (2, 20, 24, 2)).astype(np.float32)
    b = np.clip(a + rs.normal(0, 0.15, a.shape), -1, 1).astype(np.float32)
    got = np.asarray(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
    for n in range(a.shape[0]):
        want = np.mean([_np_ssim_single(a[n, :, :, c].astype(np.float64),
                                        b[n, :, :, c].astype(np.float64),
                                        2.0)
                        for c in range(a.shape[-1])])
        assert got[n] == pytest.approx(want, abs=2e-5)


def test_ssim_identity_and_ordering():
    rs = np.random.RandomState(1)
    a = jnp.asarray(rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    small = a + 0.02 * jnp.asarray(
        rs.normal(size=a.shape).astype(np.float32))
    big = a + 0.4 * jnp.asarray(rs.normal(size=a.shape).astype(np.float32))
    s_id = float(metrics.ssim(a, a)[0])
    s_small = float(metrics.ssim(a, small)[0])
    s_big = float(metrics.ssim(a, big)[0])
    assert s_id == pytest.approx(1.0, abs=1e-6)
    assert s_id > s_small > s_big
    # jit-compatible (the eval script jits the whole metric bundle)
    s_jit = float(jax.jit(metrics.ssim)(a, small)[0])
    assert s_jit == pytest.approx(s_small, abs=1e-6)


def test_ssim_rejects_tiny_images():
    a = jnp.zeros((1, 8, 8, 1))
    with pytest.raises(ValueError):
        metrics.ssim(a, a)


def test_psnr_known_value():
    a = np.zeros((1, 16, 16, 1), np.float32)
    b = np.full_like(a, 0.5)            # MSE 0.25, range 2 -> 10log10(16)
    got = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b))[0])
    assert got == pytest.approx(10 * np.log10(16.0), abs=1e-5)
    # identical images hit the 1e-12 floor, stay finite
    assert np.isfinite(float(metrics.psnr(jnp.asarray(a), jnp.asarray(a))[0]))


def test_masked_metrics_match_numpy():
    rs = np.random.RandomState(2)
    a = rs.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    b = rs.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    m = (rs.rand(2, 12, 12, 1) > 0.6).astype(np.float32)
    l1 = np.asarray(metrics.masked_l1(a, b, m))
    ps = np.asarray(metrics.masked_psnr(a, b, m))
    for n in range(2):
        sel = m[n, :, :, 0] > 0.5
        diff = (a[n][sel] - b[n][sel])
        assert l1[n] == pytest.approx(np.abs(diff).mean(), rel=1e-5)
        want_ps = 10 * np.log10(4.0 / np.square(diff).mean())
        assert ps[n] == pytest.approx(want_ps, rel=1e-5)


def test_masked_metrics_empty_mask_safe():
    a = jnp.ones((1, 12, 12, 3))
    m = jnp.zeros((1, 12, 12, 1))
    assert float(metrics.masked_l1(a, a * 0, m)[0]) == 0.0
    assert np.isfinite(float(metrics.masked_psnr(a, a * 0, m)[0]))


def test_bf16_inputs_accepted():
    rs = np.random.RandomState(3)
    a = jnp.asarray(rs.uniform(-1, 1, (1, 16, 16, 3)), jnp.bfloat16)
    s = metrics.ssim(a, a)
    assert s.dtype == jnp.float32 and float(s[0]) == pytest.approx(1.0, 1e-5)
