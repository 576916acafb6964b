"""netG — two-stage gated-conv edit generator with contextual attention.

Behavioral reference: DeepFillC2Generator (/root/reference/models/networks/
editline_g.py:13-221). Four sub-networks:

1. coarse encoder+decoder (conv1…conv17) over the masked input
   `[x*(1-mask), guide, mask]`;
2. a masked-region latent encoder (wconv1…wconv10) over
   `[x2*mask2, guide(or 0), mask2]` that global-pools (max or mean) the H/4
   features to a 96-d vector and nearest-broadcasts it back — the
   identity-preserving latent that guides synthesis;
3. stage-2 hallucination encoder (xconv1…xconv10) over the stage-1
   composite;
4. stage-2 attention encoder (pmconv1…pmconv6 + contextual attention +
   pmconv9…10), concatenated with (3) into the allconv decoder.

TPU-first: pure function over a params pytree, NHWC, the attention phase is
two MXU batched matmuls (ops/attention.py) or the fused Pallas kernel; the
full generator is one XLA region.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from sketchedit_tpu.ops.gated_conv import (
    gated_conv2d, gated_deconv2d, init_conv_params)
from sketchedit_tpu.ops.packed_tail import (
    packed_decoder_tail, packed_decoder_tail5, packed_encoder_front,
    use_mid_packing, use_packing)
from sketchedit_tpu.ops.image import avg_pool2d
from sketchedit_tpu.ops.attention import (
    contextual_attention, splitcam_attention, SplitCAMConfig)

CNUM = 48


@dataclass(frozen=True)
class DeepFillConfig:
    """Flags the reference registers per-generator (editline_g.py:14-23) plus
    the model-level --joint_train_inp (base_options.py:18-19). Defaults are
    the released-checkpoint configuration (test_celeb.sh / test_places.sh)."""
    use_cam: bool = True
    pool_type: str = "max"          # 'avg' | 'max'
    no_mask_cc: bool = False
    no_mask_coarse: bool = False
    joint_train_inp: bool = True
    # 'sharded' shards the query-patch axis over attention_mesh's 'patch'
    # axis (parallel/sharded_attention.py) — for single-image giant
    # resolutions where the batch axis cannot be split.
    attention_impl: str = "auto"    # 'auto' | 'xla' | 'pallas' | 'sharded'
    attention_mesh: object = None   # jax Mesh for attention_impl='sharded'
    # Full ReduceContextAttentionP1/P2 constructor surface. Non-released
    # settings route through the general ops.attention.splitcam_attention
    # path (the fast/Pallas path is specialized to the released config).
    attention: SplitCAMConfig = field(default_factory=SplitCAMConfig)


def _spec_encoder(prefix: str, cin0: int):
    return [
        (f"{prefix}1",              cin0,     CNUM,   5, 1, 1,  "elu", False),
        (f"{prefix}2_downsample",   CNUM//2,  2*CNUM, 3, 2, 1,  "elu", False),
        (f"{prefix}3",              CNUM,     2*CNUM, 3, 1, 1,  "elu", False),
        (f"{prefix}4_downsample",   CNUM,     4*CNUM, 3, 2, 1,  "elu", False),
        (f"{prefix}5",              2*CNUM,   4*CNUM, 3, 1, 1,  "elu", False),
        (f"{prefix}6",              2*CNUM,   4*CNUM, 3, 1, 1,  "elu", False),
        (f"{prefix}7_atrous",       2*CNUM,   4*CNUM, 3, 1, 2,  "elu", False),
        (f"{prefix}8_atrous",       2*CNUM,   4*CNUM, 3, 1, 4,  "elu", False),
        (f"{prefix}9_atrous",       2*CNUM,   4*CNUM, 3, 1, 8,  "elu", False),
        (f"{prefix}10_atrous",      2*CNUM,   4*CNUM, 3, 1, 16, "elu", False),
    ]


def _spec_decoder(prefix: str, cin11: int):
    return [
        (f"{prefix}11",               cin11,   4*CNUM,  3, 1, 1, "elu", False),
        (f"{prefix}12",               2*CNUM,  4*CNUM,  3, 1, 1, "elu", False),
        (f"{prefix}13_upsample_conv", 2*CNUM,  2*CNUM,  3, 1, 1, "elu", True),
        (f"{prefix}14",               CNUM,    2*CNUM,  3, 1, 1, "elu", False),
        (f"{prefix}15_upsample_conv", CNUM,    CNUM,    3, 1, 1, "elu", True),
        (f"{prefix}16",               CNUM//2, CNUM//2, 3, 1, 1, "elu", False),
        (f"{prefix}17",               CNUM//4, 3,       3, 1, 1, None,  False),
    ]


# stage-2 encoders have a narrower front end (editline_g.py:74-92)
_SPEC_XCONV = [
    ("xconv1",            3,        CNUM,   5, 1, 1,  "elu", False),
    ("xconv2_downsample", CNUM//2,  CNUM,   3, 2, 1,  "elu", False),
    ("xconv3",            CNUM//2,  2*CNUM, 3, 1, 1,  "elu", False),
    ("xconv4_downsample", CNUM,     2*CNUM, 3, 2, 1,  "elu", False),
    ("xconv5",            CNUM,     4*CNUM, 3, 1, 1,  "elu", False),
    ("xconv6",            2*CNUM,   4*CNUM, 3, 1, 1,  "elu", False),
    ("xconv7_atrous",     2*CNUM,   4*CNUM, 3, 1, 2,  "elu", False),
    ("xconv8_atrous",     2*CNUM,   4*CNUM, 3, 1, 4,  "elu", False),
    ("xconv9_atrous",     2*CNUM,   4*CNUM, 3, 1, 8,  "elu", False),
    ("xconv10_atrous",    2*CNUM,   4*CNUM, 3, 1, 16, "elu", False),
]

_SPEC_PMCONV = [
    ("pmconv1",            3,       CNUM,   5, 1, 1, "elu",  False),
    ("pmconv2_downsample", CNUM//2, CNUM,   3, 2, 1, "elu",  False),
    ("pmconv3",            CNUM//2, 2*CNUM, 3, 1, 1, "elu",  False),
    ("pmconv4_downsample", CNUM,    4*CNUM, 3, 2, 1, "elu",  False),
    ("pmconv5",            2*CNUM,  4*CNUM, 3, 1, 1, "elu",  False),
    ("pmconv6",            2*CNUM,  4*CNUM, 3, 1, 1, "relu", False),
]

_SPEC_PM_POST = [
    ("pmconv9",  2*CNUM, 4*CNUM, 3, 1, 1, "elu", False),
    ("pmconv10", 2*CNUM, 4*CNUM, 3, 1, 1, "elu", False),
]

LAYER_SPECS = (
    _spec_encoder("conv", 5)
    + _spec_decoder("conv", 4*CNUM)       # conv11 takes concat(96+96)
    + _spec_encoder("wconv", 5)
    + _SPEC_XCONV
    + _SPEC_PMCONV
    + _SPEC_PM_POST
    + _spec_decoder("allconv", 4*CNUM)
)


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


def _run_encoder(params, x, specs, precision, pack):
    """Encoder with the full-resolution front pair (conv1 + stride-2
    conv2) on the packed grid when the batch axis leaves MXU lanes idle."""
    if pack:
        n1, n2 = specs[0][0], specs[1][0]
        x = packed_encoder_front(params[n1], params[n2], x,
                                 precision=precision)
        return _run(params, x, specs[2:], precision)
    return _run(params, x, specs, precision)


def _run_decoder(params, x, specs, precision, pack):
    """Decoder with the upsample/head segment on the packed grid
    (ops/packed_tail.py) — exact math, better lane utilization. Crossover
    policy centralized in ops.packed_tail.use_packing; use_mid_packing
    additionally extends the packed segment to the 128^2-level layers
    (conv13_upsample/conv14) via the composed double-packed deconv."""
    if pack and use_mid_packing():
        x = _run(params, x, specs[:-5], precision)
        names = [s[0] for s in specs[-5:]]
        return packed_decoder_tail5(*(params[n] for n in names), x,
                                    precision=precision)
    x = _run(params, x, specs[:-3], precision)
    if pack:
        up, mid, head = (specs[-3][0], specs[-2][0], specs[-1][0])
        return packed_decoder_tail(params[up], params[mid], params[head], x,
                                   precision=precision)
    return _run(params, x, specs[-3:], precision)


def _attention(x, mask, config: DeepFillConfig, precision):
    """Contextual attention over pm features, gated by the hole mask pooled
    to feature resolution (editline_g.py:203-207)."""
    mask_s = avg_pool2d(mask, 4, 4)
    mask_s = jax.lax.stop_gradient(mask_s)
    if not config.attention.is_released:
        return splitcam_attention(x, x, mask_s, config.attention,
                                  precision=precision)
    impl = config.attention_impl
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu" else "xla")
    if impl == "sharded":
        from sketchedit_tpu.parallel.sharded_attention import (
            contextual_attention_sharded)
        assert config.attention_mesh is not None, \
            "attention_impl='sharded' needs DeepFillConfig.attention_mesh"
        return contextual_attention_sharded(x, x, mask_s,
                                            config.attention_mesh,
                                            precision=precision)
    if impl == "pallas":
        from sketchedit_tpu.ops.attention_pallas import (
            contextual_attention_pallas)
        return contextual_attention_pallas(x, x, mask_s)
    return contextual_attention(x, x, mask_s, precision=precision)


def apply(params, x, x2, mask, mask2, guide=None, *,
          config: DeepFillConfig = DeepFillConfig(), precision=None,
          pack: bool | None = None):
    """netG forward (editline_g.py:119-221).

    Args:
      x: input image stream (B, H, W, 3) in [-1,1] — masked internally.
      x2: context stream for the latent encoder (B, H, W, 3).
      mask: edit-region mask (B, H, W, 1), 1 = region to synthesize.
      mask2: context-region mask for the latent encoder.
      guide: sketch/line channel (B, H, W, 1); ones if absent.

    Returns (x_stage1, x_stage2), both (B, H, W, 3) in (-1, 1).
    """
    B, H, W, _ = x.shape
    if pack is None:
        pack = use_packing(B)
    if not config.no_mask_cc:
        x2 = x2 * mask2
    x = x * (1.0 - mask)
    xin = x
    ones_x = jnp.ones((B, H, W, 1), x.dtype) if guide is None else guide

    xcat = jnp.concatenate([x, ones_x, mask], axis=-1)
    guide2 = ones_x * 0.0 if config.joint_train_inp else ones_x
    x2cat = jnp.concatenate([x2, guide2, mask2], axis=-1)

    # stage 1: coarse encoder ‖ masked-region latent encoder
    h = _run_encoder(params, xcat, _spec_encoder("conv", 5), precision,
                     pack)
    h2 = _run_encoder(params, x2cat, _spec_encoder("wconv", 5), precision,
                      pack)
    hs, ws = h2.shape[1], h2.shape[2]
    if config.pool_type == "avg":
        lat = jnp.mean(h2, axis=(1, 2), keepdims=True)
    elif config.pool_type == "max":
        # global max via reduce (same forward as max_pool2d(kernel=(hs,ws));
        # its gradient lowers cleanly, unlike select_and_scatter which
        # VMEM-OOMs on 64x64 windows)
        lat = jnp.max(h2, axis=(1, 2), keepdims=True)
    else:
        raise NotImplementedError(config.pool_type)
    lat = jnp.broadcast_to(lat, (B, hs, ws, lat.shape[-1]))
    h = jnp.concatenate([h, lat], axis=-1)

    x_stage1 = jnp.tanh(_run_decoder(params, h,
                                     _spec_decoder("conv", 4*CNUM),
                                     precision, pack))

    # composite for stage 2
    if not config.no_mask_coarse:
        xnow = x_stage1 * mask + xin * (1.0 - mask)
    else:
        xnow = x_stage1

    x_hallu = _run_encoder(params, xnow, _SPEC_XCONV, precision, pack)

    pm = _run_encoder(params, xnow, _SPEC_PMCONV, precision, pack)
    if config.use_cam:
        pm = _attention(pm, mask, config, precision)
    pm = _run(params, pm, _SPEC_PM_POST, precision)

    h = jnp.concatenate([x_hallu, pm], axis=-1)
    x_stage2 = jnp.tanh(_run_decoder(params, h,
                                     _spec_decoder("allconv", 4*CNUM),
                                     precision, pack))
    return x_stage1, x_stage2


def param_groups(params, stage: str = "all"):
    """Mirrors DeepFillC2Generator.get_param_list (editline_g.py:102-116):
    'all'/'image' -> everything; 'coarse' -> conv* (the stage-1 branch);
    'fine' -> everything else (wconv/xconv/pmconv/allconv)."""
    if stage in ("all", "image"):
        return dict(params)
    if stage == "coarse":
        return {k: v for k, v in params.items() if k.startswith("conv")}
    if stage == "fine":
        return {k: v for k, v in params.items() if not k.startswith("conv")}
    return {}
