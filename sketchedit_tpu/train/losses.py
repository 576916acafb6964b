"""Training losses.

GANLoss / VGGLoss are *referenced but absent* in the reference snapshot
(editline2_model.py:97-101; SURVEY.md §2.9) — these are greenfield
implementations with the standard SPADE/DeepFill semantics the call sites
expect: gan_mode in {hinge, ls, original, w}, a VGG19 perceptual loss with
the usual 1/32..1 layer weights, and plain L1.

VGG weights cannot be downloaded in this environment; VGGLoss loads a
converted feature-extractor checkpoint from SKETCHEDIT_VGG_WEIGHTS (.npz of
conv HWIO weights) and the trainer gates the term off when unavailable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from sketchedit_tpu.ops.gated_conv import conv2d


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def mask_bce_loss(soft_mask, target):
    """Binary cross-entropy on an already-sigmoided mask, saturation-safe.

    Used for --lambda_mask_rec (direct netM supervision). BCE, not L1, on
    purpose: through a sigmoid the L1 gradient is |dL/dlogit| = m*(1-m),
    which vanishes once the mask saturates — measured: an L1-supervised
    run re-collapsed to mask ~= 0 and the loss plateaued at exactly the
    mean GT-region coverage (0.30). BCE's pull is |m - t|, constant in
    the saturated regime. The max() floors pass gradients whenever the
    clamp is inactive. Precision matters: sigmoid returns EXACTLY 1.0
    once 1-sigmoid(x) drops below half an ulp — past logit ~6.3 in bf16
    but only past ~16.6 in f32 (the 0 side is far safer: exp underflows
    near -104 in f32) — which is why the trainer computes the mask
    sigmoid in f32 (md_generator.apply mask_dtype) even under bf16
    compute: a bf16-saturated mask would zero the gradient via the clamp
    on precisely the confidently-wrong pixels this loss exists to
    correct, an order of magnitude earlier than f32 does.
    """
    m = soft_mask.astype(jnp.float32)
    t = target.astype(jnp.float32)
    eps = 1e-20      # covers logits to ~-46; f32 sigmoid underflows at ~-104
    return -jnp.mean(t * jnp.log(jnp.maximum(m, eps))
                     + (1.0 - t) * jnp.log(jnp.maximum(1.0 - m, eps)))


def gan_loss(pred, target_is_real: bool, *, mode: str = "hinge",
             for_discriminator: bool = True):
    """Standard adversarial objectives on patch logits.

    A list of logits (multiscale discriminator) averages the per-scale
    losses — SPADE GANLoss's list branch semantics."""
    if isinstance(pred, (list, tuple)):
        per = [gan_loss(p, target_is_real, mode=mode,
                        for_discriminator=for_discriminator) for p in pred]
        return sum(per) / len(per)
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return jnp.mean(jax.nn.relu(1.0 - pred))
            return jnp.mean(jax.nn.relu(1.0 + pred))
        assert target_is_real, "generator hinge loss uses fake preds as real"
        return -jnp.mean(pred)
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((pred - target) ** 2)
    if mode == "original":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    if mode == "w":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise ValueError(f"unknown gan_mode {mode!r}")


# --- VGG19 perceptual loss ------------------------------------------------

# .features-index boundaries of the 5 taps: through relu1_1, relu2_1,
# relu3_1, relu4_1, relu5_1 (the SPADE VGG19 slice ends)
_VGG_SLICES = (2, 7, 12, 21, 30)
_VGG_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def load_vgg_params(path: str | None = None):
    """Load VGG19 conv weights from an .npz of {'conv_i_w','conv_i_b'}."""
    path = path or os.environ.get("SKETCHEDIT_VGG_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    import numpy as np
    with np.load(path) as data:
        params = []
        i = 0
        while f"conv_{i}_w" in data:
            params.append({"w": jnp.asarray(data[f"conv_{i}_w"]),
                           "b": jnp.asarray(data[f"conv_{i}_b"])})
            i += 1
    n_convs = sum(1 for c in _VGG_CFG if c != "M")
    if len(params) != n_convs:
        # fail loudly at startup: a short/malformed file would otherwise
        # pass the trainer's `is not None` gate and crash mid-step
        raise ValueError(
            f"{path} has {len(params)} conv_i_w/b pairs; VGG19 needs "
            f"{n_convs} (see scripts/convert_vgg19.py)")
    return params


def vgg_features(params, x, imagenet_norm: bool = True):
    """x in [-1,1] NHWC -> list of feature maps at the 5 standard slices.

    Default is a deliberate delta vs SPADE's VGGLoss (which feeds [-1,1]
    straight into VGG19): we remap to the ImageNet normalization the
    network was trained with — the perceptual features are only
    meaningful there. Pass imagenet_norm=False (--vgg_imagenet_norm 0)
    for the lineage-exact [-1,1] feeding. tests/test_vgg.py pins both
    paths against a torch oracle."""
    if imagenet_norm:
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        h = ((x + 1.0) / 2.0 - mean) / std
    else:
        h = x
    feats = []
    layer_idx = 0        # torchvision .features index
    conv_i = 0
    for c in _VGG_CFG:
        if c == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            layer_idx += 1
        else:
            h = conv2d(params[conv_i], h)
            conv_i += 1
            layer_idx += 1
            h = jax.nn.relu(h)
            layer_idx += 1
        if layer_idx in _VGG_SLICES:
            feats.append(h)
    return feats


def vgg_loss(vgg_params, x, y, imagenet_norm: bool = True):
    fx = vgg_features(vgg_params, x, imagenet_norm)
    fy = vgg_features(vgg_params, jax.lax.stop_gradient(y), imagenet_norm)
    return sum(w * l1_loss(a, jax.lax.stop_gradient(b))
               for w, a, b in zip(_VGG_WEIGHTS, fx, fy))
