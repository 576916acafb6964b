"""EditLine2 — the sketch-edit pipeline (netM + netG + composite).

Behavioral reference: EditLine2Model (/root/reference/models/
editline2_model.py). Inference semantics (generate_fake :338-370 at
eval + forward 'inference' :128-133):

    soft_mask, mask_image = netM(image, sketch)
    hard_mask  = (soft_mask > 0.5)                 # fed to netG
    coarse, fake = netG(image, image, hard_mask, hard_mask, sketch)
    composed = fake * soft_mask + image * (1 - soft_mask)   # SOFT blend

The training-time 3-way branch (random-mask inpainting / soft mask /
thresholded mask) lives in train/trainer.py where the branch index comes
from an explicit PRNG key instead of Python random state.

TPU-first: `edit()` is a single pure function — one jit, one device
invocation per (shape, dtype) — returning (composed, soft_mask, aux).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from sketchedit_tpu.models import md_generator, deepfill_c2
from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig


@dataclass(frozen=True)
class EditLine2Config:
    netg: DeepFillConfig = field(default_factory=DeepFillConfig)
    mask_threshold: float = 0.5
    precision: str | None = "highest"   # None => backend default (bf16-ish)
    compute_dtype: str = "float32"      # 'float32' | 'bfloat16'

    @property
    def lax_precision(self):
        return None if self.precision is None else jax.lax.Precision(
            self.precision.lower())


def init_params(key, *, init_type: str = "xavier", gain: float = 0.02,
                dtype=jnp.float32):
    km, kg = jax.random.split(key)
    return {
        "M": md_generator.init_params(km, init_type=init_type, gain=gain,
                                      dtype=dtype),
        "G": deepfill_c2.init_params(kg, init_type=init_type, gain=gain,
                                     dtype=dtype),
    }


def generate(params, image, sketch, *, config: EditLine2Config = EditLine2Config()):
    """Full eval-mode generate_fake: returns all intermediates."""
    prec = config.lax_precision
    dt = jnp.dtype(config.compute_dtype)
    image = image.astype(dt)
    sketch = sketch.astype(dt)

    soft_mask, mask_image = md_generator.apply(
        params["M"], image, sketch, precision=prec)
    hard_mask = jax.lax.stop_gradient(
        (soft_mask > config.mask_threshold).astype(dt))
    coarse, fake = deepfill_c2.apply(
        params["G"], image, image, hard_mask, hard_mask, sketch,
        config=config.netg, precision=prec)
    return {
        "coarse": coarse,
        "fake": fake,
        "mask": soft_mask,
        "mask_image": mask_image,
        "mask_inpaint": hard_mask,
    }


def edit(params, image, sketch, *, config: EditLine2Config = EditLine2Config()):
    """The public edit function: (image, sketch) -> (composed, soft_mask).

    image: (B, H, W, 3) in [-1, 1]; sketch: (B, H, W, 1) in {0, 1}.
    H and W must be multiples of 4 (two stride-2 downsamples) — of 8 when
    the Pallas attention path is active (its space-to-depth patch grid
    needs an even H/4 feature map). The demo/serving paths round to /8.
    """
    B, H, W = image.shape[:3]
    impl = config.netg.attention_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    need = 8 if (impl == "pallas" and config.netg.attention.is_released) \
        else 4
    if H % need or W % need:
        raise ValueError(
            f"input size {H}x{W} must be a multiple of {need} "
            f"(two stride-2 stages + x2 decoders"
            + (" + pallas s2d patch grid" if need == 8 else "")
            + "); the demo path rounds to /8")
    out = generate(params, image, sketch, config=config)
    soft = out["mask"]
    composed = out["fake"] * soft + image.astype(soft.dtype) * (1.0 - soft)
    return composed, soft


def edit_u8(params, image_u8, sketch_u8, *,
            config: EditLine2Config = EditLine2Config()):
    """Edit from raw uint8 inputs: decode-side normalization fused into the
    device program (the host ships 4x fewer bytes than f32). Returns
    (composed_u8 RGB, mask_u8 grayscale) — the denormalization is fused
    too, so one device invocation goes uint8 -> uint8.

    image_u8: (B, H, W, 3) uint8; sketch_u8: (B, H, W, 1) uint8 (0 = no
    stroke), matching the reference's `(x/255 - .5)/.5` and `>0` prep.
    """
    dt = jnp.dtype(config.compute_dtype)
    image = image_u8.astype(dt) / 127.5 - 1.0
    sketch = (sketch_u8 > 0).astype(dt)
    composed, mask = edit(params, image, sketch, config=config)
    composed_u8 = jnp.round(
        (jnp.clip(composed, -1, 1) + 1.0) * 127.5).astype(jnp.uint8)
    mask_u8 = jnp.round(jnp.clip(mask, 0, 1) * 255.0).astype(jnp.uint8)
    return composed_u8, mask_u8


def make_edit_fn(params, *, config: EditLine2Config = EditLine2Config(),
                 donate: bool = False):
    """edit() jit-closed over params: fn(image, sketch) -> (composed,
    soft_mask). One compile per input shape; donate=True donates the
    image buffer (serving can reuse it in place)."""
    return jax.jit(partial(edit, params, config=config),
                   donate_argnums=(0,) if donate else ())


def forward(params, data: dict, mode: str, *,
            config: EditLine2Config = EditLine2Config()):
    """Mode-dispatch facade matching the reference model's call surface
    (editline2_model.py:107-147): data keys 'image' and 'mask' (the sketch),
    modes 'inference' and 'visualize'. Training modes live in
    train/trainer.py where the loss machinery is.
    """
    image, sketch = data["image"], data["mask"]
    if mode == "inference":
        return edit(params, image, sketch, config=config)
    if mode == "visualize":
        out = generate(params, image, sketch, config=config)
        soft = out["mask"]
        composed = (out["fake"] * soft
                    + image.astype(soft.dtype) * (1.0 - soft))
        return {
            "mask": out["mask_inpaint"],
            "maskim": out["mask_image"],
            "coarse": out["coarse"],
            "fine": out["fake"],
            "composed": composed,
        }
    raise ValueError(f"|mode| '{mode}' is invalid for the inference "
                     "pipeline; use train.trainer for generator/"
                     "discriminator steps")
