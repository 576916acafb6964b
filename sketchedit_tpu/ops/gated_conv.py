"""Gated convolution primitives, NHWC, TPU-first.

Semantics match the reference generator primitives
(/root/reference/models/networks/utils.py:9-70):

- ``gated_conv2d``: 2-D conv with SAME-style padding ``p = rate*(k-1)//2`` and
  dilation ``rate``; unless the declared output-channel count is 3 or the
  activation is None, the output is split in half along channels and combined
  as ``act(a) * sigmoid(g)`` (free-form gating). The *effective* output width
  is therefore half the declared ``cout``.
- ``gated_deconv2d``: nearest-neighbor x2 upsample followed by a 3x3 gated
  conv (reference ``gen_deconv``).
- ``leaky_conv2d``: 5x5/stride-2 conv + leaky-relu (reference ``dis_conv``,
  used by the discriminator).

Everything here is a pure function of a ``{'w': HWIO, 'b': (O,)}`` params
dict; weights live in HWIO so the MXU sees channel-last contractions without
relayout. All math stays in the input dtype except the conv accumulation,
which the MXU accumulates in fp32 internally regardless of output dtype.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(params, x, *, stride: int = 1, rate: int = 1, precision=None):
    """Plain biased conv with the reference's padding rule.

    `precision`: lax.Precision for the contraction. Parity paths pass
    HIGHEST (full fp32 — the default low precision loses ~1e-2 vs torch);
    throughput paths run bf16 data with default precision for the MXU.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    p = int(rate * (k - 1) / 2)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(p, p), (p, p)],
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIMNUMS,
        precision=precision,
    )
    y = y.astype(x.dtype) + params["b"].astype(x.dtype)
    return y


def _activate(y, activation):
    if activation == "elu":
        return jax.nn.elu(y)
    if activation == "relu":
        return jax.nn.relu(y)
    raise ValueError(f"unknown activation {activation!r}")


def gated_conv2d(params, x, *, stride: int = 1, rate: int = 1,
                 activation: str | None = "elu", precision=None):
    """Gated conv: conv -> split channels -> act(a) * sigmoid(g).

    Gating is skipped when the declared output width is 3 (RGB heads) or when
    ``activation is None`` (mask/RGB heads that apply tanh/sigmoid outside) —
    the same rule as the reference (utils.py:27-28).
    """
    y = conv2d(params, x, stride=stride, rate=rate, precision=precision)
    cout = params["w"].shape[-1]
    if cout == 3 or activation is None:
        return y
    a, g = jnp.split(y, 2, axis=-1)
    return _activate(a, activation) * jax.nn.sigmoid(g)


def _expand_deconv_weights(w):
    """3x3 kernel -> the 4-tap-per-dim kernel whose lhs-dilated conv equals
    nearest-x2-upsample + 3x3 conv exactly.

    Derivation: out(2i+a) = sum_dy w[dy] * x((2i+a+dy-1)//2) collapses to a
    2-tap filter per output phase; embedding both phases in one
    lhs_dilation=2 conv gives taps [w0, w0+w1, w1+w2, w2] along each dim.
    """
    def taps(v):        # combine along leading axis (len 3 -> 4)
        return jnp.stack([v[0], v[0] + v[1], v[1] + v[2], v[2]], 0)
    wr = taps(w)                          # rows: (4,3,Ci,Co)
    wc = taps(jnp.moveaxis(wr, 1, 0))     # cols: (4,4,Ci,Co) [col-major]
    return jnp.moveaxis(wc, 1, 0)


def gated_deconv2d(params, x, *, activation: str | None = "elu",
                   precision=None):
    """x2 nearest upsample + 3x3 gated conv (reference gen_deconv,
    utils.py:35-51), computed as ONE lhs-dilated convolution — the
    upsampled intermediate (4x the activation bytes) never materializes.
    Numerically identical up to fp add-order within the combined taps.
    """
    w = params["w"]
    assert w.shape[0] == 3 and w.shape[1] == 3, "gen_deconv is always 3x3"
    w4 = _expand_deconv_weights(w).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=_DIMNUMS, precision=precision,
    ).astype(x.dtype) + params["b"].astype(x.dtype)
    cout = w.shape[-1]
    if cout == 3 or activation is None:
        return y
    a, g = jnp.split(y, 2, axis=-1)
    return _activate(a, activation) * jax.nn.sigmoid(g)


def leaky_conv2d(params, x, *, stride: int = 2, negative_slope: float = 0.01,
                 precision=None):
    """5x5 stride-2 conv + leaky-relu (reference dis_conv).

    The reference uses ``F.leaky_relu`` with its default slope 0.01.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    p = int((k - 1) / 2)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(p, p), (p, p)],
        dimension_numbers=_DIMNUMS, precision=precision,
    ).astype(x.dtype) + params["b"].astype(x.dtype)
    return jax.nn.leaky_relu(y, negative_slope)


def init_conv_params(key, cin: int, cout: int, ksize: int, *,
                     init_type: str = "xavier", gain: float = 0.02,
                     dtype=jnp.float32):
    """Initialize one conv layer's params matching torch init conventions.

    Mirrors BaseNetwork.init_weights (reference base_network.py:23-47):
    xavier = xavier_normal_ with the given gain; kaiming = kaiming_normal_
    fan_in; biases zero. 'none' falls back to torch's Conv2d default
    (kaiming_uniform a=sqrt(5) + uniform bias), reproduced here so fresh
    models are distribution-identical to the reference.
    """
    wkey, bkey = jax.random.split(key)
    fan_in = cin * ksize * ksize
    fan_out = cout * ksize * ksize
    shape = (ksize, ksize, cin, cout)
    if init_type == "xavier":
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        w = jax.random.normal(wkey, shape, dtype) * std
        b = jnp.zeros((cout,), dtype)
    elif init_type == "xavier_uniform":
        a = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(wkey, shape, dtype, -a, a)
        b = jnp.zeros((cout,), dtype)
    elif init_type == "kaiming":
        std = math.sqrt(2.0 / fan_in)
        w = jax.random.normal(wkey, shape, dtype) * std
        b = jnp.zeros((cout,), dtype)
    elif init_type == "normal":
        w = jax.random.normal(wkey, shape, dtype) * gain
        b = jnp.zeros((cout,), dtype)
    elif init_type == "orthogonal":
        flat = jax.random.normal(wkey, (cout, fan_in), jnp.float32)
        q, r = jnp.linalg.qr(flat.T if fan_in >= cout else flat)
        q = q * jnp.sign(jnp.diagonal(r))
        q = q.T if fan_in >= cout else q        # (cout, fan_in)
        w = (gain * q).reshape(cout, cin, ksize, ksize)
        w = jnp.transpose(w, (2, 3, 1, 0)).astype(dtype)
        b = jnp.zeros((cout,), dtype)
    elif init_type == "none":
        bound_w = math.sqrt(6.0 / ((1 + 5) * fan_in))  # kaiming_uniform a=sqrt(5)
        w = jax.random.uniform(wkey, shape, dtype, -bound_w, bound_w)
        bound_b = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(bkey, (cout,), dtype, -bound_b, bound_b)
    else:
        raise NotImplementedError(f"init [{init_type}] not implemented")
    return {"w": w, "b": b}
