"""Training step for the EditLine2 pipeline (greenfield, reference-shaped).

The reference snapshot ships no train loop, but its model code defines the
intended semantics (editline2_model.py): a 3-way random branch in
generate_fake (:338-370), the g_image_loss stack (:244-301), concat-batch
discrimination (:375-406), TTUR Adam (:149-173), and partial updates via
get_param_list groups. This module realizes them TPU-first:

* the whole G-step + D-step is ONE jitted function; the random branch index
  comes from an explicit PRNG key through `lax.switch` (static shapes, no
  Python branching on traced values);
* random masks are host-side inputs (data/mask_creator.py), two per batch
  (`random_mask` for the inpainting branch, `random_mask2` for the rm2
  context erosion);
* gradients reduce across the data-parallel mesh automatically under jit
  (XLA inserts the psum when the batch axis is sharded);
* TTUR: optax.adam pairs at lr/2 (G) and lr*2 (D), betas (0, 0.9);
* partial updates: static gradient masks from the param_groups tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import jax
import jax.numpy as jnp
import optax

from sketchedit_tpu.models import md_generator, deepfill_c2, discriminator
from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
from sketchedit_tpu.ops.image import gaussian_blur3x3
from sketchedit_tpu.train import losses


@dataclass(frozen=True)
class TrainConfig:
    netg: DeepFillConfig = field(default_factory=DeepFillConfig)
    gan_mode: str = "hinge"
    lambda_l1: float = 1.0
    lambda_l1_mask: float = 1.0
    lambda_mask_rec: float = 0.0    # direct netM supervision (greenfield)
    lambda_vgg: float = 10.0
    no_gan_loss: bool = False
    no_vgg_loss: bool = True          # enable when VGG weights are provided
    vgg_imagenet_norm: bool = True    # False = SPADE-lineage [-1,1] feed
    filt_maskim: bool = False
    no_detach: bool = False
    update_part: str = "all"
    netd: str = "sngan"              # 'sngan' | 'multiscale'
    num_d: int = 2                   # scales for netd='multiscale'
    lr: float = 2e-4
    beta1: float = 0.0
    beta2: float = 0.9
    no_TTUR: bool = False
    mask_threshold: float = 0.5
    precision: str | None = None
    # Mixed precision: network forwards/backwards run in this dtype
    # (params, optimizer moments, and losses stay fp32 — the master-weight
    # pattern; bf16 shares fp32's exponent range so no loss scaling).
    compute_dtype: str = "float32"
    # Fresh-training init. The reference default (xavier gain 0.02,
    # base_options.py:56-57) yields ~6e-4-std weights that underflow
    # gradients through this norm-free 17-layer stack; kaiming keeps signal
    # scale healthy. 'xavier' remains available for strict compat
    # (train.py wires --init_type/--init_variance here).
    init_type: str = "kaiming"
    init_gain: float = 0.02          # used by the xavier compat path
    # Rematerialize the generator forward in the backward pass — trades
    # ~30% step time for roughly halved activation memory; enables larger
    # per-chip train batches at 256^2+.
    remat: bool = False
    # Speed option (OFF = reference-faithful): reuse the G-step's generated
    # batch (detached) for the D update instead of re-running the generator
    # forward. Deviates from the reference semantics in two ways: D sees
    # the PRE-update G's fakes, and the G/D branch flags are coupled
    # (editline2_model.py:340 draws them independently).
    reuse_fake: bool = False

    @property
    def lax_precision(self):
        return None if self.precision is None else jax.lax.Precision(
            self.precision)

    @property
    def train_mask_only(self) -> bool:
        """True when update_part selects no generator params
        (editline2_model.py:153-155)."""
        return not deepfill_c2.param_groups(
            {n: 0 for n, *_ in deepfill_c2.LAYER_SPECS}, self.update_part)

    @property
    def train_maskim(self) -> bool:
        return self.update_part == "maskim"

    # linear lr decay (--niter_decay, SPADE-style): full lr for
    # lr_decay_start steps, then linear to 0 over lr_decay_steps steps.
    # 0 decay steps = constant lr. train.py converts the epoch-denominated
    # flags to steps (steps_per_epoch * niter / niter_decay).
    lr_decay_start: int = 0
    lr_decay_steps: int = 0

    def g_lr(self):
        return self.lr if self.no_TTUR else self.lr / 2

    def d_lr(self):
        return self.lr if self.no_TTUR else self.lr * 2

    def lr_schedule(self, base_lr: float):
        """Scalar or optax schedule for one optimizer."""
        if self.lr_decay_steps <= 0:
            return base_lr
        return optax.join_schedules(
            [optax.constant_schedule(base_lr),
             optax.linear_schedule(base_lr, 0.0, self.lr_decay_steps)],
            [self.lr_decay_start])


def make_optimizers(cfg: TrainConfig):
    """The TTUR Adam pair; single construction point so init_train_state
    and train_step always agree on the (possibly scheduled) lr."""
    opt_g = optax.adam(cfg.lr_schedule(cfg.g_lr()), b1=cfg.beta1,
                       b2=cfg.beta2)
    opt_d = optax.adam(cfg.lr_schedule(cfg.d_lr()), b1=cfg.beta1,
                       b2=cfg.beta2)
    return opt_g, opt_d


def _grad_mask(cfg: TrainConfig, params):
    """Static 0/1 pytree selecting trainable leaves per update_part."""
    m_names = set(md_generator.param_groups(params["M"], cfg.update_part))
    g_names = set(deepfill_c2.param_groups(params["G"], cfg.update_part))

    def mask_net(net, names):
        return {k: jax.tree_util.tree_map(
            lambda _: 1.0 if k in names else 0.0, v)
            for k, v in net.items()}

    return {"M": mask_net(params["M"], m_names),
            "G": mask_net(params["G"], g_names)}


def init_train_state(key, cfg: TrainConfig, dtype=jnp.float32):
    km, kg, kd = jax.random.split(key, 3)
    params = {
        "M": md_generator.init_params(km, init_type=cfg.init_type,
                                      gain=cfg.init_gain, dtype=dtype),
        "G": deepfill_c2.init_params(kg, init_type=cfg.init_type,
                                     gain=cfg.init_gain, dtype=dtype),
        "D": (discriminator.init_multiscale_params(kd, num_d=cfg.num_d,
                                                   dtype=dtype)
              if cfg.netd == "multiscale"
              else discriminator.init_params(kd, dtype=dtype)),
    }
    gen_params = {"M": params["M"], "G": params["G"]}
    opt_g, opt_d = make_optimizers(cfg)
    return {
        "params": params,
        "opt_g": opt_g.init(gen_params),
        "opt_d": opt_d.init(discriminator.trainable(params["D"])),
        "step": jnp.zeros((), jnp.int32),
    }


def generate_fake_train(gen_params, batch, flag, cfg: TrainConfig):
    """Train-mode generate_fake (editline2_model.py:338-370).

    flag 0: pure inpainting — random mask, full edge map, gt as input0.
    flag 1: soft predicted mask (detached unless no_detach).
    flag 2: thresholded predicted mask.
    """
    prec = cfg.lax_precision
    cdt = jnp.dtype(cfg.compute_dtype)
    # network compute in cfg.compute_dtype (conv weights are cast per-op to
    # the activation dtype); everything returned is fp32 for the losses
    inputs = batch["image"].astype(cdt)
    real = batch["gt"].astype(cdt)
    line = batch["mask"].astype(cdt)
    line_full = batch["edgegt"].astype(cdt)

    # the mask sigmoid runs in f32 (mask_dtype): the BCE supervision term
    # needs unsaturated probabilities, which bf16 cannot represent past
    # |logit| ~ 6.3. The netG graph keeps consuming the cdt copy.
    soft_mask, mask_image = md_generator.apply(
        gen_params["M"], inputs, line, precision=prec,
        mask_dtype=jnp.float32)
    soft_mask_cdt = soft_mask.astype(cdt)

    def branch_inpaint(_):
        m = batch["random_mask"].astype(cdt)
        return m, line_full * m, real

    def branch_soft(_):
        m = (soft_mask_cdt if cfg.no_detach
             else jax.lax.stop_gradient(soft_mask_cdt))
        return m, line, inputs

    def branch_hard(_):
        m = jax.lax.stop_gradient(
            (soft_mask > cfg.mask_threshold).astype(cdt))
        return m, line, inputs

    mask_inpaint, line_inpaint, inputs0 = jax.lax.switch(
        flag, (branch_inpaint, branch_soft, branch_hard), None)

    rm2 = (1.0 - batch["random_mask2"].astype(cdt)) * mask_inpaint

    coarse, fake = deepfill_c2.apply(
        gen_params["G"], inputs0, inputs, mask_inpaint, rm2, line_inpaint,
        config=cfg.netg, precision=prec)
    f32 = jnp.float32
    return {
        "coarse": coarse.astype(f32), "fake": fake.astype(f32),
        "mask": soft_mask, "mask_image": mask_image.astype(f32),
        "mask_inpaint": mask_inpaint.astype(f32),
        "line_inpaint": line_inpaint.astype(f32),
        "input_inpaint": inputs0.astype(f32),
    }


def _discriminate(d_params, fake_image, real_image, line, inputs, mask,
                  cfg: TrainConfig, update_sn=False):
    """Concat-batch discrimination (editline2_model.py:375-390): fake is
    composited over real with the detached mask, fake and real share one
    batch, predictions split back."""
    cdt = jnp.dtype(cfg.compute_dtype)
    m = jax.lax.stop_gradient(mask)
    fake_comp = fake_image * m + real_image * (1.0 - m)
    both = jnp.concatenate([fake_comp, real_image], axis=0).astype(cdt)
    line2 = jnp.concatenate([line, line], axis=0).astype(cdt)
    cc2 = jnp.concatenate([inputs, inputs], axis=0).astype(cdt)
    out = discriminator.apply(d_params, both, line2, cc2,
                              precision=cfg.lax_precision,
                              update_sn=update_sn)
    if update_sn:
        logits, new_d = out
    else:
        logits, new_d = out, None

    def divide(t):
        # divide_pred (editline2_model.py:392-406): the concat batch splits
        # back into fake/real halves; the list branch handles multiscale D
        t = t.astype(jnp.float32)
        n = t.shape[0] // 2
        return t[:n], t[n:]

    if isinstance(logits, list):
        pairs = [divide(t) for t in logits]
        return [f for f, _ in pairs], [r for _, r in pairs], new_d
    fake, real = divide(logits)
    return fake, real, new_d


def g_image_loss(d_params, gen, batch, cfg: TrainConfig, vgg_params=None,
                 is_real_im=True):
    """The generator loss stack (editline2_model.py:244-301)."""
    inputs, real = batch["image"], batch["gt"]
    input_inpaint = gen["input_inpaint"]

    blur = gaussian_blur3x3 if cfg.filt_maskim else (lambda x: x)
    real_blur = blur(real)
    inputs_blur = blur(inputs)
    input_inpaint_blur = blur(input_inpaint)

    out_ims = {"coarse": gen["coarse"], "fake": gen["fake"],
               "mask": gen["mask_image"]}
    in_ims = {"coarse": input_inpaint, "fake": input_inpaint,
              "mask": inputs}
    blur_in_ims = {"coarse": input_inpaint_blur, "fake": input_inpaint_blur,
                   "mask": inputs_blur}
    com_masks = {"coarse": gen["mask_inpaint"], "fake": gen["mask_inpaint"],
                 "mask": gen["mask"]}
    com_ims = {k: out_ims[k] * com_masks[k] + in_ims[k] * (1 - com_masks[k])
               for k in out_ims}
    blur_com_ims = {k: out_ims[k] * com_masks[k]
                    + blur_in_ims[k] * (1 - com_masks[k]) for k in out_ims}

    G = {}
    if not cfg.train_mask_only and not cfg.no_gan_loss and is_real_im:
        pred_fake, _pred_real, _ = _discriminate(
            d_params, com_ims["fake"], real, gen["line_inpaint"], inputs,
            gen["mask_inpaint"], cfg)
        G["GAN"] = losses.gan_loss(pred_fake, True, mode=cfg.gan_mode,
                                   for_discriminator=False)

    if (not cfg.train_mask_only and not cfg.no_vgg_loss
            and vgg_params is not None and is_real_im):
        G["VGG"] = losses.vgg_loss(
            vgg_params, out_ims["fake"], real,
            imagenet_norm=cfg.vgg_imagenet_norm) * cfg.lambda_vgg

    l1c = 0.0
    if not cfg.train_mask_only and is_real_im:
        l1c = losses.l1_loss(out_ims["coarse"], real) * cfg.lambda_l1
        if cfg.update_part in ("all", "fine"):
            G["L1f"] = losses.l1_loss(out_ims["fake"], real) * cfg.lambda_l1
    l1c = l1c + losses.l1_loss(out_ims["mask"], real_blur) * cfg.lambda_l1_mask
    if not cfg.train_maskim:
        l1c = l1c + (losses.l1_loss(blur_com_ims["mask"], real_blur)
                     * cfg.lambda_l1_mask)
    G["L1c"] = l1c
    # Direct mask supervision vs the sampled GT region (greenfield,
    # --lambda_mask_rec, default OFF = reference-exact). Measured necessity:
    # with inputs == gt (the reference default, editline2_model.py:227-230)
    # every shipped loss term — mask-composite L1, GAN, VGG — is exactly
    # minimized by soft_mask == 0 (composite degenerates to the real input),
    # and a 250-epoch from-scratch run converged to that collapse
    # (max soft_mask 1e-4). The released netM must have been trained with
    # supervision the reference repo does not contain (its training dataset
    # and recipe were never published); the SketchEdit paper's mask
    # estimator is learned against the sampled region that generated the
    # partial sketch, which is what this term implements. BCE, not L1 —
    # see losses.mask_bce_loss for the measured saturation argument.
    if cfg.lambda_mask_rec and "region_gt" in batch:
        G["Mrec"] = (losses.mask_bce_loss(gen["mask"], batch["region_gt"])
                     * cfg.lambda_mask_rec)
    return G


def d_loss_from_gen(d_params, gen, batch, cfg: TrainConfig):
    """Discriminator loss given an (already detached) generated batch."""
    composed = (gen["fake"] * gen["mask_inpaint"]
                + gen["input_inpaint"] * (1 - gen["mask_inpaint"]))
    pred_fake, pred_real, new_d = _discriminate(
        d_params, composed, batch["gt"], gen["line_inpaint"],
        batch["image"], gen["mask_inpaint"], cfg, update_sn=True)
    d_fake = losses.gan_loss(pred_fake, False, mode=cfg.gan_mode)
    d_real = losses.gan_loss(pred_real, True, mode=cfg.gan_mode)
    return d_fake + d_real, (d_fake, d_real, new_d)


def d_loss_fn(d_params, gen_params, batch, flag, cfg: TrainConfig):
    """Discriminator loss (editline2_model.py:318-336) + SN state update.
    Regenerates the fakes under stop_gradient with its own branch flag —
    the reference's exact training distribution."""
    gen = jax.lax.stop_gradient(
        generate_fake_train(gen_params, batch, flag, cfg))
    return d_loss_from_gen(d_params, gen, batch, cfg)


def decompress_batch(batch):
    """Expand a compact-protocol batch (data._collate(compact=True):
    uint8 'image' in [0,255], bool masks, 'gt' omitted) to the canonical
    float32 keys ON DEVICE. The casts fuse into the first consumer under
    XLA, the host ships ~6x fewer bytes, and the loader skips its
    measured-2.5ms/item host-side f32 expansion. Float batches pass
    through unchanged, so every existing caller keeps working."""
    out = dict(batch)
    img = batch.get("image")
    if img is not None and img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 127.5 - 1.0
        out["image"] = img
        if "gt" not in batch:
            out["gt"] = img          # the edit target IS the input image
    gt = out.get("gt")
    if gt is not None and gt.dtype == jnp.uint8:
        out["gt"] = gt.astype(jnp.float32) / 127.5 - 1.0
    for k in ("mask", "edgegt", "random_mask", "random_mask2", "region_gt"):
        v = out.get(k)
        if v is not None and v.dtype == jnp.bool_:
            out[k] = v.astype(jnp.float32)
    return out


def train_step(state, batch, key, cfg: TrainConfig, vgg_params=None):
    """One jitted G+D step. batch keys: image, gt, mask (sketch), edgegt,
    random_mask, random_mask2 — NHWC float32, or the compact protocol
    (uint8/bool, expanded on device by decompress_batch)."""
    batch = decompress_batch(batch)
    params = state["params"]
    # The reference draws random.randint(0,2) independently inside each
    # generate_fake call, so the G and D updates of one step see independent
    # branch flags (editline2_model.py:340) — split the key accordingly.
    kflag_g, kflag_d = jax.random.split(key)
    low = 0 if cfg.netg.joint_train_inp else 1
    flag = jax.random.randint(kflag_g, (), low, 3)
    flag_d = jax.random.randint(kflag_d, (), low, 3)

    opt_g, opt_d = make_optimizers(cfg)

    # ---- generator update ----
    gen_fwd = generate_fake_train
    if cfg.remat:
        gen_fwd = jax.checkpoint(
            generate_fake_train, static_argnums=(3,))

    def g_total(gen_params):
        gen = gen_fwd(gen_params, batch, flag, cfg)
        G = g_image_loss(params["D"], gen, batch, cfg, vgg_params)
        return sum(G.values()), (G, gen)

    gen_params = {"M": params["M"], "G": params["G"]}
    (g_sum, (G_losses, gen_out)), g_grads = jax.value_and_grad(
        g_total, has_aux=True)(gen_params)
    gmask = _grad_mask(cfg, params)
    g_grads = jax.tree_util.tree_map(
        lambda g, m: g * m, g_grads, {"M": gmask["M"], "G": gmask["G"]})
    g_updates, new_opt_g = opt_g.update(g_grads, state["opt_g"], gen_params)
    gen_params = optax.apply_updates(gen_params, g_updates)
    new_params = {**params, "M": gen_params["M"], "G": gen_params["G"]}

    # ---- discriminator update ----
    if cfg.no_gan_loss:
        new_opt_d = state["opt_d"]
        d_metrics = {}
    else:
        d_trainable = discriminator.trainable(params["D"])

        def d_total(dt):
            d_full = discriminator.with_u(dt, params["D"])
            if cfg.reuse_fake:
                return d_loss_from_gen(
                    d_full, jax.lax.stop_gradient(gen_out), batch, cfg)
            return d_loss_fn(d_full, gen_params, batch, flag_d, cfg)

        (_d_sum, (d_fake, d_real, new_d)), d_grads = jax.value_and_grad(
            d_total, has_aux=True)(d_trainable)
        d_updates, new_opt_d = opt_d.update(d_grads, state["opt_d"],
                                            d_trainable)
        d_trainable = optax.apply_updates(d_trainable, d_updates)
        new_params["D"] = discriminator.with_u(d_trainable, new_d)
        d_metrics = {"D_Fake": d_fake, "D_real": d_real}

    new_state = {
        "params": new_params,
        "opt_g": new_opt_g,
        "opt_d": new_opt_d,
        "step": state["step"] + 1,
    }
    metrics = {"G_total": g_sum, **G_losses, **d_metrics,
               "flag": flag.astype(jnp.float32)}
    return new_state, metrics
