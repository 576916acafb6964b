"""netM — the mask-prediction network ("MD" generator).

Predicts, from (image, partial sketch), a soft spatial mask of the region
the sketch wants to edit plus a blurred guess of the edited image (the
latter only feeds the training loss).

Behavioral reference: MDGenerator (/root/reference/models/networks/
editline2_g.py:13-94): a shared gated-conv encoder (two stride-2
downsamples + dilation pyramid 2/4/8/16 at H/4) and two gated-conv
decoders. One structural quirk is reproduced deliberately: the image
decoder (conv11…conv17) consumes the *conv9* activation while the mask
decoder (conv_mask_11…17) consumes the conv10 bottleneck
(editline2_g.py:76-86 — `x_bneck = conv10(x)` then `conv11(x)` reuses the
pre-bottleneck x).

TPU-first design: pure function over a params pytree, NHWC activations so
channels ride the 128-wide lane dimension, static shapes, no Python state;
the whole net is one fusable XLA region inside the pipeline jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sketchedit_tpu.ops.gated_conv import (
    gated_conv2d, gated_deconv2d, init_conv_params)
from sketchedit_tpu.ops.packed_tail import (
    packed_decoder_tail, packed_encoder_front, use_packing)

CNUM = 48

# (name, cin_effective, cout_declared, ksize, stride, rate, activation, deconv)
# cin is the *gated* (halved) width of the previous layer.
_ENCODER = [
    ("conv1",              4,        CNUM,     5, 1, 1,  "elu", False),
    ("conv2_downsample",   CNUM//2,  2*CNUM,   3, 2, 1,  "elu", False),
    ("conv3",              CNUM,     2*CNUM,   3, 1, 1,  "elu", False),
    ("conv4_downsample",   CNUM,     4*CNUM,   3, 2, 1,  "elu", False),
    ("conv5",              2*CNUM,   4*CNUM,   3, 1, 1,  "elu", False),
    ("conv6",              2*CNUM,   4*CNUM,   3, 1, 1,  "elu", False),
    ("conv7_atrous",       2*CNUM,   4*CNUM,   3, 1, 2,  "elu", False),
    ("conv8_atrous",       2*CNUM,   4*CNUM,   3, 1, 4,  "elu", False),
    ("conv9_atrous",       2*CNUM,   4*CNUM,   3, 1, 8,  "elu", False),
    ("conv10_atrous",      2*CNUM,   4*CNUM,   3, 1, 16, "elu", False),
]

def _decoder_spec(prefix: str, out_ch: int):
    return [
        (f"{prefix}11",                2*CNUM,  4*CNUM,  3, 1, 1, "elu", False),
        (f"{prefix}12",                2*CNUM,  4*CNUM,  3, 1, 1, "elu", False),
        (f"{prefix}13_upsample_conv",  2*CNUM,  2*CNUM,  3, 1, 1, "elu", True),
        (f"{prefix}14",                CNUM,    2*CNUM,  3, 1, 1, "elu", False),
        (f"{prefix}15_upsample_conv",  CNUM,    CNUM,    3, 1, 1, "elu", True),
        (f"{prefix}16",                CNUM//2, CNUM//2, 3, 1, 1, "elu", False),
        (f"{prefix}17",                CNUM//4, out_ch,  3, 1, 1, None,  False),
    ]

_IMAGE_DECODER = _decoder_spec("conv", 3)
_MASK_DECODER = _decoder_spec("conv_mask_", 1)

LAYER_SPECS = _ENCODER + _IMAGE_DECODER + _MASK_DECODER


def init_params(key, *, init_type: str = "xavier", gain: float = 0.02,
                dtype=jnp.float32):
    params = {}
    keys = jax.random.split(key, len(LAYER_SPECS))
    for k, (name, cin, cout, ksize, _s, _r, _a, _d) in zip(keys, LAYER_SPECS):
        params[name] = init_conv_params(
            k, cin, cout, ksize, init_type=init_type, gain=gain, dtype=dtype)
    return params


def _run(params, x, specs, precision):
    for name, _cin, _cout, _k, stride, rate, act, deconv in specs:
        if deconv:
            x = gated_deconv2d(params[name], x, activation=act,
                               precision=precision)
        else:
            x = gated_conv2d(params[name], x, stride=stride, rate=rate,
                             activation=act, precision=precision)
    return x


def _run_decoder(params, x, specs, precision, pack):
    """Decoder runner: the final upsample->conv->head segment executes on
    the space-to-depth-packed grid (ops/packed_tail.py) — same math, far
    better MXU lane utilization at the full-resolution/narrow-channel tail.
    """
    x = _run(params, x, specs[:-3], precision)
    # The packed tail quadruples tail FLOPs for 4x better lane utilization
    # — crossover policy centralized in ops.packed_tail.use_packing.
    if pack:
        up, mid, head = (specs[-3][0], specs[-2][0], specs[-1][0])
        return packed_decoder_tail(params[up], params[mid], params[head], x,
                                   precision=precision)
    return _run(params, x, specs[-3:], precision)


def apply(params, image, sketch, *, precision=None, pack: bool | None = None,
          mask_dtype=None):
    """netM forward.

    Args:
      image: (B, H, W, 3) in [-1, 1].
      sketch: (B, H, W, 1) binary line drawing.
      pack: force the space-to-depth packed fronts/tails on or off
        (None = the measured B<64 crossover, which applies to training
        graphs too — packing is a measured WIN there as well, see
        use_packing).
    Returns:
      (soft_mask (B,H,W,1) in (0,1), mask_image (B,H,W,3) in (-1,1)).
    """
    x = jnp.concatenate([image, sketch], axis=-1)
    if pack is None:
        pack = use_packing(x.shape[0])
    if pack:
        # packed front: see ops/packed_tail.packed_encoder_front
        x = packed_encoder_front(params["conv1"],
                                 params["conv2_downsample"], x,
                                 precision=precision)
        start = 2
    else:
        start = 0
    for spec in _ENCODER[start:-1]:
        name, _cin, _cout, _k, stride, rate, act, _d = spec
        x = gated_conv2d(params[name], x, stride=stride, rate=rate,
                         activation=act, precision=precision)
    x_pre = x                                   # conv9 output
    x_bneck = gated_conv2d(params["conv10_atrous"], x_pre, rate=16,
                           precision=precision)  # mask-branch bottleneck

    mask_image = jnp.tanh(
        _run_decoder(params, x_pre, _IMAGE_DECODER, precision, pack))
    logits = _run_decoder(params, x_bneck, _MASK_DECODER, precision, pack)
    # mask_dtype widens the sigmoid (train passes float32): a bf16 sigmoid
    # returns EXACTLY 0/1 for |logit| >~ 6.3, which kills the BCE mask-
    # supervision gradient on confidently-wrong pixels (losses.mask_bce_loss)
    if mask_dtype is not None:
        logits = logits.astype(mask_dtype)
    soft_mask = jax.nn.sigmoid(logits)
    return soft_mask, mask_image


def param_groups(params, stage: str = "all"):
    """Partial-update groups mirroring MDGenerator.get_param_list
    (editline2_g.py:46-57): 'all'/'mask' -> everything; 'maskim' -> only
    layers named conv* (i.e. not conv_mask_*)."""
    if stage in ("all", "mask"):
        return dict(params)
    if stage == "maskim":
        # The reference filters on name.startswith("conv"), which every layer
        # in this net satisfies (including conv_mask_*) — so 'maskim' selects
        # everything too. Quirk preserved for checkpoint/training parity.
        return {k: v for k, v in params.items() if k.startswith("conv")}
    return {}
