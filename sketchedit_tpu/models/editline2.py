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


def pad_to_grid(image, sketch, multiple: int = 8):
    """Edge-pad the image (zero-pad the sketch) on the bottom/right up to
    the next multiple-of-`multiple` size. Returns (image, sketch, (H, W))
    with the ORIGINAL size for cropping the outputs back.

    Edge replication keeps boundary statistics sane for the convs; the
    zero sketch pad adds no strokes, so netM stays quiet in the pad strip.
    """
    H, W = image.shape[1:3]
    # floor each side at 16: the 4x4/stride-2 attention patch grid at H/4
    # yields ZERO patches below 16 px and the net crashes with an opaque
    # shape error (the demo path floors at 16 for the same reason)
    th = max(16, H + (-H) % multiple)
    tw = max(16, W + (-W) % multiple)
    ph, pw = th - H, tw - W
    if not (ph or pw):
        return image, sketch, (H, W)
    image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    sketch = jnp.pad(sketch, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return image, sketch, (H, W)


def edit(params, image, sketch, *, config: EditLine2Config = EditLine2Config()):
    """The public edit function: (image, sketch) -> (composed, soft_mask).

    image: (B, H, W, 3) in [-1, 1]; sketch: (B, H, W, 1) in {0, 1}.

    Any H/W >= 1 is accepted: non-/8 sizes are edge-padded to the next /8
    (floored at 16 px per side — below that the attention patch grid is
    empty) and the outputs cropped back (static shapes — one compile per
    size). The
    network itself needs /8 (two stride-2 stages, x2 decoders, and the
    4x4/stride-2 attention patch grid at H/4 must tile evenly); the
    REFERENCE hard-crashes on anything else — its attention fold emits an
    (H/4 - 1) grid that fails the stage-2 concat (editline_g.py:203-210,
    verified live: 252x252 and 260x260 raise RuntimeError) — so padding
    here is a capability the reference never had. The demo path still
    rounds to /8 before calling (demo.py:43-45 parity).
    """
    B, H, W = image.shape[:3]
    image_p, sketch_p, _ = pad_to_grid(image, sketch, 8)
    out = generate(params, image_p, sketch_p, config=config)
    soft = out["mask"][:, :H, :W]
    fake = out["fake"][:, :H, :W]
    composed = fake * soft + image.astype(soft.dtype) * (1.0 - soft)
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
