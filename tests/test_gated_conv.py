"""Parity tests for the gated-conv primitives vs torch oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from sketchedit_tpu.ops import gated_conv2d, gated_deconv2d, leaky_conv2d
from sketchedit_tpu.ops.gated_conv import conv2d, init_conv_params
import jax

from torch_oracle import torch_gated_conv, to_nchw, to_nhwc, hwio_to_oihw

RTOL, ATOL = 1e-5, 1e-5


def _rand_params(key, cin, cout, k):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (k, k, cin, cout)) * 0.1
    b = jax.random.normal(kb, (cout,)) * 0.1
    return {"w": w, "b": b}


@pytest.mark.parametrize("cin,cout,k,stride,rate,act", [
    (4, 48, 5, 1, 1, "elu"),       # conv1 of netM
    (24, 96, 3, 2, 1, "elu"),      # downsample
    (96, 192, 3, 1, 2, "elu"),     # dilated
    (96, 192, 3, 1, 16, "elu"),    # max dilation
    (96, 192, 3, 1, 1, "relu"),    # pmconv6
    (12, 3, 3, 1, 1, None),        # RGB head: no gating
    (12, 1, 3, 1, 1, None),        # mask head: no gating
])
def test_gated_conv_matches_torch(cin, cout, k, stride, rate, act):
    key = jax.random.PRNGKey(hash((cin, cout, k, stride, rate)) % 2**31)
    params = _rand_params(key, cin, cout, k)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, cin)))

    got = np.asarray(gated_conv2d(params, jnp.asarray(x),
                                  stride=stride, rate=rate, activation=act))
    want = to_nhwc(torch_gated_conv(
        to_nchw(x), hwio_to_oihw(np.asarray(params["w"])),
        torch.from_numpy(np.asarray(params["b"])),
        stride=stride, rate=rate, activation=act))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_gated_conv_rgb_head_skips_gating():
    """cout==3 must return the raw conv output (no split/gating)."""
    key = jax.random.PRNGKey(0)
    params = _rand_params(key, 12, 3, 3)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 12).astype(np.float32))
    got = gated_conv2d(params, x, activation="elu")
    raw = conv2d(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(raw))


def test_gated_deconv_matches_torch():
    key = jax.random.PRNGKey(3)
    params = _rand_params(key, 96, 96, 3)
    x = np.random.RandomState(1).randn(2, 8, 8, 96).astype(np.float32)

    got = np.asarray(gated_deconv2d(params, jnp.asarray(x)))

    xt = F.interpolate(to_nchw(x), scale_factor=2)
    want = to_nhwc(torch_gated_conv(
        xt, hwio_to_oihw(np.asarray(params["w"])),
        torch.from_numpy(np.asarray(params["b"])), stride=1, rate=1))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_leaky_conv_matches_torch():
    key = jax.random.PRNGKey(4)
    params = _rand_params(key, 6, 64, 5)
    x = np.random.RandomState(2).randn(2, 16, 16, 6).astype(np.float32)
    got = np.asarray(leaky_conv2d(params, jnp.asarray(x), stride=2))
    y = F.conv2d(to_nchw(x), hwio_to_oihw(np.asarray(params["w"])),
                 torch.from_numpy(np.asarray(params["b"])), stride=2, padding=2)
    want = to_nhwc(F.leaky_relu(y))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_init_shapes_and_stats():
    p = init_conv_params(jax.random.PRNGKey(0), 24, 96, 3, init_type="xavier")
    assert p["w"].shape == (3, 3, 24, 96)
    assert p["b"].shape == (96,)
    # xavier_normal std = gain * sqrt(2/(fan_in+fan_out))
    import math
    fan_in, fan_out = 24 * 9, 96 * 9
    want_std = 0.02 * math.sqrt(2 / (fan_in + fan_out))
    assert abs(float(jnp.std(p["w"])) - want_std) / want_std < 0.05
    assert float(jnp.max(jnp.abs(p["b"]))) == 0.0
