"""Training-stack tests: losses, discriminator, one jitted train step, and
the multi-chip dry run over the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchedit_tpu.models import discriminator
from sketchedit_tpu.train import losses
from sketchedit_tpu.train.trainer import (
    TrainConfig, init_train_state, train_step, generate_fake_train)


def _tiny_batch(B=2, H=32, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "image": rs.uniform(-1, 1, (B, H, H, 3)).astype(np.float32),
        "gt": rs.uniform(-1, 1, (B, H, H, 3)).astype(np.float32),
        "mask": (rs.rand(B, H, H, 1) > 0.9).astype(np.float32),
        "edgegt": (rs.rand(B, H, H, 1) > 0.9).astype(np.float32),
        "random_mask": (rs.rand(B, H, H, 1) > 0.7).astype(np.float32),
        "random_mask2": (rs.rand(B, H, H, 1) > 0.7).astype(np.float32),
    }


def test_gan_loss_modes():
    pred = jnp.asarray([[-2.0, 0.5, 3.0]])
    # hinge D: relu(1-p) for real, relu(1+p) for fake
    np.testing.assert_allclose(
        float(losses.gan_loss(pred, True, mode="hinge")),
        np.mean([3.0, 0.5, 0.0]))
    np.testing.assert_allclose(
        float(losses.gan_loss(pred, False, mode="hinge")),
        np.mean([0.0, 1.5, 4.0]))
    # hinge G: -mean(pred)
    np.testing.assert_allclose(
        float(losses.gan_loss(pred, True, mode="hinge",
                              for_discriminator=False)),
        -float(jnp.mean(pred)))
    # ls
    np.testing.assert_allclose(
        float(losses.gan_loss(pred, True, mode="ls")),
        float(jnp.mean((pred - 1) ** 2)))
    # original == BCE with logits
    import torch
    import torch.nn.functional as F
    t = torch.tensor([[-2.0, 0.5, 3.0]])
    want = F.binary_cross_entropy_with_logits(t, torch.ones_like(t)).item()
    np.testing.assert_allclose(
        float(losses.gan_loss(pred, True, mode="original")), want, rtol=1e-5)


def test_discriminator_shapes_and_sn():
    params = discriminator.init_params(jax.random.PRNGKey(0))
    B, H = 2, 64
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(B, H, H, 3).astype(np.float32))
    line = jnp.asarray(rs.rand(B, H, H, 1).astype(np.float32))
    logits, new_params = discriminator.apply(params, img, line, img,
                                             update_sn=True)
    assert logits.shape == (B, 1, 1, 256)
    # power iteration moved u
    assert not np.allclose(np.asarray(new_params["dconv1"]["u"]),
                           np.asarray(params["dconv1"]["u"]))
    # after a few iterations the top singular value of w/sigma ~ 1
    p = params["dconv1"]
    for _ in range(30):
        _, u = discriminator._spectral_normalize(p)
        p = {**p, "u": u}
    w_sn, _ = discriminator._spectral_normalize(p)
    s = np.linalg.svd(np.asarray(w_sn).reshape(-1, w_sn.shape[-1]),
                      compute_uv=False)
    assert abs(s[0] - 1.0) < 1e-2


def test_generate_fake_train_branches():
    cfg = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    gen_params = {"M": state["params"]["M"], "G": state["params"]["G"]}
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    for flag in (0, 1, 2):
        out = generate_fake_train(gen_params, batch, jnp.int32(flag), cfg)
        assert out["fake"].shape == batch["image"].shape
        if flag == 0:
            np.testing.assert_allclose(np.asarray(out["mask_inpaint"]),
                                       np.asarray(batch["random_mask"]))
            np.testing.assert_allclose(np.asarray(out["input_inpaint"]),
                                       np.asarray(batch["gt"]))
        if flag == 2:
            vals = np.unique(np.asarray(out["mask_inpaint"]))
            assert set(vals).issubset({0.0, 1.0})


def test_train_step_updates_params():
    cfg = TrainConfig()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    step = jax.jit(lambda st, b, k: train_step(st, b, k, cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state["step"]) == 1
    assert np.isfinite(float(metrics["G_total"]))
    # G params moved
    w0 = np.asarray(state["params"]["G"]["conv1"]["w"])
    w1 = np.asarray(new_state["params"]["G"]["conv1"]["w"])
    assert not np.allclose(w0, w1)
    # D params moved
    d0 = np.asarray(state["params"]["D"]["dconv1"]["w"])
    d1 = np.asarray(new_state["params"]["D"]["dconv1"]["w"])
    assert not np.allclose(d0, d1)


def test_mask_rec_supervision():
    """--lambda_mask_rec: direct BCE on the predicted soft mask vs the
    sampled GT region (BCE, not L1 — L1 re-collapses through the saturated
    sigmoid; losses.mask_bce_loss). Off by default (reference-exact
    objective — which, with inputs==gt, is exactly minimized by a zero mask
    and collapses in practice); when on, the term must appear in the
    metrics and equal bce(mask, region_gt)*lambda."""
    from sketchedit_tpu.train.trainer import g_image_loss

    batch_np = _tiny_batch()
    batch_np["region_gt"] = (np.random.RandomState(5)
                             .rand(2, 32, 32, 1) > 0.6).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    cfg_off = TrainConfig(no_gan_loss=True)
    cfg_on = TrainConfig(no_gan_loss=True, lambda_mask_rec=3.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg_on)
    gen = generate_fake_train(
        {"M": state["params"]["M"], "G": state["params"]["G"]}, batch,
        jnp.asarray(1), cfg_on)

    g_off = g_image_loss(state["params"]["D"], gen, batch, cfg_off)
    g_on = g_image_loss(state["params"]["D"], gen, batch, cfg_on)
    assert "Mrec" not in g_off
    m = np.asarray(gen["mask"], np.float64)
    t = np.asarray(batch["region_gt"], np.float64)
    expect = -np.mean(t * np.log(m) + (1 - t) * np.log(1 - m)) * 3.0
    np.testing.assert_allclose(float(g_on["Mrec"]), expect, rtol=1e-4)

    # a full step reports the metric and still updates netM
    step = jax.jit(lambda st, b, k: train_step(st, b, k, cfg_on))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Mrec"]))
    m0 = np.asarray(state["params"]["M"]["conv1"]["w"])
    m1 = np.asarray(new_state["params"]["M"]["conv1"]["w"])
    assert not np.allclose(m0, m1)

    # batches without the key (non-editimage datasets) run unchanged
    _, metrics2 = jax.jit(lambda st, b, k: train_step(st, b, k, cfg_on))(
        init_train_state(jax.random.PRNGKey(0), cfg_on),
        {k: v for k, v in batch.items() if k != "region_gt"},
        jax.random.PRNGKey(1))
    assert "Mrec" not in metrics2


def test_mask_sigmoid_widened_to_f32_under_bf16():
    """Under bf16 compute the trainer must evaluate the mask sigmoid in
    f32 (md_generator.apply mask_dtype): bf16 sigmoid returns EXACTLY 1.0
    past logit ~6.3, and mask_bce_loss's clamp then zeroes the gradient on
    confidently-wrong pixels — the exact case the BCE supervision exists
    to correct."""
    from sketchedit_tpu.models import md_generator

    cfg = TrainConfig(no_gan_loss=True, compute_dtype="bfloat16",
                      lambda_mask_rec=1.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    params_m = jax.tree.map(lambda x: x, state["params"]["M"])
    # force logits into the window where bf16 sigmoid saturates to exactly
    # 1.0 (past ~6.3) but f32 does not (only past ~16.6)
    params_m["conv_mask_17"]["b"] = (
        params_m["conv_mask_17"]["b"] + 12.0)

    batch_np = _tiny_batch()
    inputs = jnp.asarray(batch_np["image"], jnp.bfloat16)
    line = jnp.asarray(batch_np["mask"], jnp.bfloat16)

    soft_bf16, _ = md_generator.apply(params_m, inputs, line)
    soft_f32, _ = md_generator.apply(params_m, inputs, line,
                                     mask_dtype=jnp.float32)
    assert soft_f32.dtype == jnp.float32
    # bf16 saturates to exactly 1.0; the widened sigmoid stays strictly
    # inside (0, 1) so log(1-m) keeps a live gradient
    assert float(jnp.max(soft_bf16.astype(jnp.float32))) == 1.0
    assert float(jnp.max(soft_f32)) < 1.0

    # wiring: the bf16 train path returns the f32 mask to the losses, and
    # BCE against an all-zero target has nonzero grad through netM
    gen = generate_fake_train(
        {"M": params_m, "G": state["params"]["G"]},
        {k: jnp.asarray(v) for k, v in batch_np.items()},
        jnp.asarray(1), cfg)
    assert gen["mask"].dtype == jnp.float32
    assert float(jnp.max(gen["mask"])) < 1.0

    def bce_through_netm(pm):
        soft, _ = md_generator.apply(pm, inputs, line,
                                     mask_dtype=jnp.float32)
        return losses.mask_bce_loss(soft, jnp.zeros_like(soft))
    g = jax.grad(bce_through_netm)(params_m)
    assert float(jnp.max(jnp.abs(g["conv_mask_17"]["b"]))) > 0.0


def test_partial_update_mask_only():
    cfg = TrainConfig(update_part="mask", no_gan_loss=True)
    assert cfg.train_mask_only
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    new_state, _ = jax.jit(
        lambda st, b, k: train_step(st, b, k, cfg))(
        state, batch, jax.random.PRNGKey(1))
    # netG frozen, netM updated
    g0 = np.asarray(state["params"]["G"]["conv1"]["w"])
    g1 = np.asarray(new_state["params"]["G"]["conv1"]["w"])
    np.testing.assert_array_equal(g0, g1)
    m0 = np.asarray(state["params"]["M"]["conv1"]["w"])
    m1 = np.asarray(new_state["params"]["M"]["conv1"]["w"])
    assert not np.allclose(m0, m1)


def test_train_step_reuse_fake():
    """--reuse_fake: the D update consumes the G-step's generated batch
    (no regeneration); both nets still update and metrics stay finite."""
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    cfg = TrainConfig(reuse_fake=True,
                      netg=DeepFillConfig(attention_impl="xla"))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    new_state, metrics = jax.jit(
        lambda st, b, k: train_step(st, b, k, cfg))(
        state, batch, jax.random.PRNGKey(5))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert {"D_Fake", "D_real"} <= set(metrics)
    for net in ("G", "M"):
        w0 = np.asarray(state["params"][net]["conv1"]["w"])
        w1 = np.asarray(new_state["params"][net]["conv1"]["w"])
        assert np.abs(w1 - w0).max() > 0
    w0 = np.asarray(state["params"]["D"]["dconv1"]["w"])
    w1 = np.asarray(new_state["params"]["D"]["dconv1"]["w"])
    assert np.abs(w1 - w0).max() > 0


def test_train_step_multiscale_discriminator():
    """--netD multiscale: list logits flow through divide_pred's list
    branch (editline2_model.py:397-406 analog), per-scale GAN losses
    average, and the D update lands on every scale."""
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    cfg = TrainConfig(netd="multiscale", num_d=2,
                      netg=DeepFillConfig(attention_impl="xla"))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert set(state["params"]["D"]) == {"scale0", "scale1"}
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    new_state, metrics = jax.jit(
        lambda st, b, k: train_step(st, b, k, cfg))(
        state, batch, jax.random.PRNGKey(3))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    for scale in ("scale0", "scale1"):
        w0 = np.asarray(state["params"]["D"][scale]["dconv1"]["w"])
        w1 = np.asarray(new_state["params"]["D"][scale]["dconv1"]["w"])
        assert np.abs(w1 - w0).max() > 0, scale


def test_downsample2_matches_torch_avgpool():
    """The multiscale-D downsample must be exactly SPADE's
    nn.AvgPool2d(3, 2, padding=1, count_include_pad=False) — border
    positions divide by the VALID count (4 or 6), not 9."""
    torch = pytest.importorskip("torch")
    from sketchedit_tpu.models.discriminator import _downsample2

    rs = np.random.RandomState(0)
    for h, w in ((8, 8), (9, 7), (5, 5)):
        x = rs.randn(2, h, w, 3).astype(np.float32)
        want = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, padding=1,
            count_include_pad=False).permute(0, 2, 3, 1).numpy()
        got = np.asarray(_downsample2(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_multiscale_logit_shapes_and_gan_loss_list():
    from sketchedit_tpu.models import discriminator as D
    from sketchedit_tpu.train import losses
    params = D.init_multiscale_params(jax.random.PRNGKey(1), num_d=2)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(2, 128, 128, 3).astype(np.float32))
    line = jnp.asarray(rs.randn(2, 128, 128, 1).astype(np.float32))
    logits = D.apply(params, img, line, img)
    assert isinstance(logits, list) and len(logits) == 2
    assert logits[1].shape[1] == logits[0].shape[1] // 2   # pooled scale
    per = [float(losses.gan_loss(l, True, mode="hinge")) for l in logits]
    combined = float(losses.gan_loss(logits, True, mode="hinge"))
    np.testing.assert_allclose(combined, sum(per) / 2, rtol=1e-6)


def test_train_step_bfloat16_mixed_precision():
    """compute_dtype=bfloat16: params/optimizer stay fp32 (master weights),
    the step runs, updates land, and losses agree loosely with fp32."""
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    losses_by_dtype = {}
    for dt in ("float32", "bfloat16"):
        cfg = TrainConfig(compute_dtype=dt,
                          netg=__import__(
                              "sketchedit_tpu.models.deepfill_c2",
                              fromlist=["DeepFillConfig"]).DeepFillConfig(
                              attention_impl="xla"))
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        new_state, metrics = jax.jit(
            lambda st, b, k, c=cfg: train_step(st, b, k, c))(
            state, batch, jax.random.PRNGKey(7))
        w0 = np.asarray(state["params"]["G"]["conv1"]["w"])
        w1 = np.asarray(new_state["params"]["G"]["conv1"]["w"])
        assert w1.dtype == np.float32          # master weights stay fp32
        assert np.abs(w1 - w0).max() > 0
        assert all(np.isfinite(float(v)) for v in metrics.values())
        losses_by_dtype[dt] = {k: float(v) for k, v in metrics.items()}
    a, b = losses_by_dtype["float32"], losses_by_dtype["bfloat16"]
    assert a["flag"] == b["flag"]              # same branch drawn
    np.testing.assert_allclose(a["G_total"], b["G_total"], rtol=0.05)
    np.testing.assert_allclose(a["L1c"], b["L1c"], rtol=0.05)


def test_lr_linear_decay_schedule():
    """--niter_decay: constant lr through the boundary step, then linear to
    zero. Adam with a constant gradient steps by exactly lr, so the update
    magnitude reads the schedule directly."""
    from sketchedit_tpu.train.trainer import make_optimizers
    cfg = TrainConfig(lr=0.1, no_TTUR=True, beta1=0.9, beta2=0.999,
                      lr_decay_start=2, lr_decay_steps=4)
    opt_g, opt_d = make_optimizers(cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    state = opt_g.init(params)
    sizes = []
    for _ in range(6):
        upd, state = opt_g.update(grads, state, params)
        sizes.append(float(jnp.abs(upd["w"]).max()))
    assert sizes[0] == pytest.approx(0.1, rel=1e-4)
    assert sizes[1] == pytest.approx(sizes[0], rel=1e-5)   # pre-boundary
    assert sizes[3] < sizes[2]                             # decaying
    assert sizes[5] < sizes[4] < sizes[3]
    assert sizes[5] == pytest.approx(0.1 * 0.25, rel=1e-3)  # 3/4 through

    # no decay flags -> plain constant lr
    cfg0 = TrainConfig(lr=0.1, no_TTUR=True)
    og0, _ = make_optimizers(cfg0)
    st0 = og0.init(params)
    for _ in range(3):
        upd, st0 = og0.update(grads, st0, params)
    assert float(jnp.abs(upd["w"]).max()) == pytest.approx(0.1, rel=1e-4)


def test_dryrun_multichip_cpu_mesh():
    import __graft_entry__ as ge
    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)


def test_remat_step_matches_plain():
    """--remat (jax.checkpoint around the generator forward) trades step
    time for memory and must be numerics-exact: one step with remat on
    equals one step without, metric for metric and weight for weight."""
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch().items()}
    results = []
    for remat in (False, True):
        cfg = TrainConfig(remat=remat)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(lambda st, b, k: train_step(st, b, k, cfg))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        results.append((new_state, metrics))
    (s0, m0), (s1, m1) = results
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(
        np.asarray(s1["params"]["G"]["conv1"]["w"]),
        np.asarray(s0["params"]["G"]["conv1"]["w"]), rtol=1e-6)
