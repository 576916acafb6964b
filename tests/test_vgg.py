"""VGG19 perceptual-loss stack: converter round-trip, feature/loss parity
vs torch, and the full generator loss dict with VGG enabled vs a torch
reimplementation of the reference g_image_loss (editline2_model.py:244-301).

Real torchvision weights cannot be downloaded here, so the oracle is a
numerically-pinned fixture: a torch VGG19 `.features` clone with the exact
torchvision module layout and key names (`features.{idx}.weight`), seeded
weights. The converter mapping and the slice taps are what's under test —
they are weight-agnostic.
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from sketchedit_tpu.train import losses  # noqa: E402

_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _torchvision_vgg19_features(seed=0):
    """nn.Sequential with torchvision vgg19().features module indices."""
    layers = []
    cin = 3
    for c in _VGG19_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = c
    seq = nn.Sequential(*layers)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in seq:
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.05)
    return seq


@pytest.fixture(scope="module")
def vgg_fixture(tmp_path_factory):
    """(torch features module, converted jax params)."""
    import convert_vgg19
    tmp = tmp_path_factory.mktemp("vgg")
    feats = _torchvision_vgg19_features()
    state = {f"features.{i}.{p}": t for i, m in enumerate(feats)
             if isinstance(m, nn.Conv2d)
             for p, t in (("weight", m.weight.data), ("bias", m.bias.data))}
    src = tmp / "vgg19_fixture.pth"
    dst = tmp / "vgg19_features.npz"
    torch.save(state, str(src))
    n = convert_vgg19.convert(str(src), str(dst))
    assert n == 16
    params = losses.load_vgg_params(str(dst))
    assert params is not None and len(params) == 16
    # HWIO shape check on the first conv
    assert params[0]["w"].shape == (3, 3, 3, 64)
    return feats, params


def _torch_preprocess(x_nchw):
    """Mirror losses.vgg_features input mapping: [-1,1] -> ImageNet norm."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return ((x_nchw + 1.0) / 2.0 - mean) / std


def _torch_vgg_taps(feats, x_nchw):
    h = _torch_preprocess(x_nchw)
    taps = []
    for idx, m in enumerate(feats, start=1):
        h = m(h)
        if idx in losses._VGG_SLICES:
            taps.append(h)
    return taps


def test_vgg_features_parity(vgg_fixture):
    feats, params = vgg_fixture
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    got = losses.vgg_features(params, jnp.asarray(x))
    with torch.no_grad():
        want = _torch_vgg_taps(feats, torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        wn = w.numpy().transpose(0, 2, 3, 1)
        # deep taps accumulate through 16 convs; tolerance scales with the
        # feature magnitude (fp32 associativity noise, not a mapping error)
        tol = 1e-4 * max(1.0, float(np.abs(wn).max()))
        np.testing.assert_allclose(np.asarray(g), wn, rtol=1e-3, atol=tol)


def test_vgg_features_lineage_norm_parity(vgg_fixture):
    """--vgg_imagenet_norm 0: the SPADE-lineage behavior feeds [-1,1]
    straight into VGG19 (SPADE models/networks/loss.py VGGLoss); pinned
    vs the same torch oracle without the ImageNet remap."""
    feats, params = vgg_fixture
    rs = np.random.RandomState(2)
    x = rs.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    got = losses.vgg_features(params, jnp.asarray(x), imagenet_norm=False)
    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = []
        for idx, m in enumerate(feats, start=1):
            h = m(h)
            if idx in losses._VGG_SLICES:
                want.append(h)
    for g, w in zip(got, want):
        wn = w.numpy().transpose(0, 2, 3, 1)
        tol = 1e-4 * max(1.0, float(np.abs(wn).max()))
        np.testing.assert_allclose(np.asarray(g), wn, rtol=1e-3, atol=tol)


def test_vgg_loss_parity(vgg_fixture):
    feats, params = vgg_fixture
    rs = np.random.RandomState(1)
    x = rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    y = rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    got = float(losses.vgg_loss(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        fx = _torch_vgg_taps(feats, torch.from_numpy(x.transpose(0, 3, 1, 2)))
        fy = _torch_vgg_taps(feats, torch.from_numpy(y.transpose(0, 3, 1, 2)))
        want = sum(w * F.l1_loss(a, b) for w, a, b in
                   zip(losses._VGG_WEIGHTS, fx, fy))
    np.testing.assert_allclose(got, float(want), rtol=1e-4)


# --- full loss-stack parity with VGG enabled --------------------------------

def _reference_gaussian_kernel():
    """get_gaussian_kernel (editline2_model.py:13-46): 3x3 sigma=2
    depthwise, groups=3, replicate padding 1."""
    import math
    kernel_size, sigma = 3, 2.0
    coords = torch.arange(kernel_size).float()
    mean = (kernel_size - 1) / 2.0
    g1 = torch.exp(-((coords - mean) ** 2) / (2 * sigma ** 2))
    k = g1[:, None] * g1[None, :]
    k = k / k.sum()
    return k.expand(3, 1, kernel_size, kernel_size).contiguous()


def _torch_g_image_loss(tensors, feats, opt):
    """Line-faithful torch reimplementation of the reference g_image_loss
    (editline2_model.py:244-301), with criterionVGG = the SPADE-slice L1
    stack and criterionGAN = hinge generator loss."""
    t = {k: torch.from_numpy(v.transpose(0, 3, 1, 2)) for k, v in
         tensors.items()}
    kern = _reference_gaussian_kernel()

    def filt(x):
        xp = F.pad(x, (1, 1, 1, 1), mode="replicate")
        return F.conv2d(xp, kern, groups=3)

    blur = filt if opt["filt_maskim"] else (lambda x: x)
    real_image_blur = blur(t["real"])
    inputs_blur = blur(t["inputs"])
    input_inpaint_blur = blur(t["input_inpaint"])

    out_ims = {"coarse": t["coarse"], "fake": t["fake"], "mask": t["mask_image"]}
    in_ims = {"coarse": t["input_inpaint"], "fake": t["input_inpaint"],
              "mask": t["inputs"]}
    blur_in_ims = {"coarse": input_inpaint_blur, "fake": input_inpaint_blur,
                   "mask": inputs_blur}
    com_masks = {"coarse": t["mask_inpaint"], "fake": t["mask_inpaint"],
                 "mask": t["mask"]}
    com_ims, blur_com_ims = {}, {}
    for k in out_ims:
        com_ims[k] = out_ims[k] * com_masks[k] + in_ims[k] * (1 - com_masks[k])
        blur_com_ims[k] = (out_ims[k] * com_masks[k]
                           + blur_in_ims[k] * (1 - com_masks[k]))

    G = {}
    if not opt["no_gan_loss"]:
        pred_fake = opt["discriminate_fn"](
            com_ims["fake"].numpy().transpose(0, 2, 3, 1))
        G["GAN"] = -float(np.mean(pred_fake))         # hinge, generator side

    if not opt["no_vgg_loss"]:
        fx = _torch_vgg_taps(feats, out_ims["fake"])
        fy = _torch_vgg_taps(feats, t["real"])
        G["VGG"] = float(sum(
            w * F.l1_loss(a, b) for w, a, b in
            zip(losses._VGG_WEIGHTS, fx, fy))) * opt["lambda_vgg"]

    l1c = float(F.l1_loss(out_ims["coarse"], t["real"])) * opt["lambda_l1"]
    G["L1f"] = float(F.l1_loss(out_ims["fake"], t["real"])) * opt["lambda_l1"]
    l1c += float(F.l1_loss(out_ims["mask"], real_image_blur)) * opt["lambda_l1_mask"]
    l1c += float(F.l1_loss(blur_com_ims["mask"], real_image_blur)) * opt["lambda_l1_mask"]
    G["L1c"] = l1c
    return G


@pytest.mark.parametrize("filt_maskim", [False, True])
def test_g_image_loss_stack_parity_with_vgg(vgg_fixture, filt_maskim):
    """Our g_image_loss (trainer.py) == the reference loss assembly
    (editline2_model.py:244-301) with the VGG term ENABLED, on identical
    synthetic generator outputs. The GAN logits come from our real jax
    discriminator through a shared callback so the composite fed to D is
    checked too."""
    from sketchedit_tpu.models import discriminator
    from sketchedit_tpu.train.trainer import TrainConfig, g_image_loss

    feats, vgg_params = vgg_fixture
    rs = np.random.RandomState(2)
    B, H = 2, 32

    def img():
        return rs.uniform(-1, 1, (B, H, H, 3)).astype(np.float32)

    def msk(p=0.5):
        return (rs.rand(B, H, H, 1) > p).astype(np.float32)

    soft_mask = rs.rand(B, H, H, 1).astype(np.float32)
    tensors = {
        "inputs": img(), "real": img(), "input_inpaint": img(),
        "coarse": img(), "fake": img(), "mask_image": img(),
        "mask_inpaint": msk(), "mask": soft_mask,
    }
    line = msk(0.9)

    d_params = discriminator.init_params(jax.random.PRNGKey(0))

    cfg = TrainConfig(filt_maskim=filt_maskim, no_vgg_loss=False,
                      lambda_vgg=10.0, precision="highest")
    gen = {
        "coarse": jnp.asarray(tensors["coarse"]),
        "fake": jnp.asarray(tensors["fake"]),
        "mask": jnp.asarray(tensors["mask"]),
        "mask_image": jnp.asarray(tensors["mask_image"]),
        "mask_inpaint": jnp.asarray(tensors["mask_inpaint"]),
        "line_inpaint": jnp.asarray(line),
        "input_inpaint": jnp.asarray(tensors["input_inpaint"]),
    }
    batch = {"image": jnp.asarray(tensors["inputs"]),
             "gt": jnp.asarray(tensors["real"])}
    G = g_image_loss(d_params, gen, batch, cfg, vgg_params)
    got = {k: float(v) for k, v in G.items()}

    def discriminate_fn(fake_comp_nhwc):
        """Reference discriminate (editline2_model.py:375-390) minus the
        inner composite (the torch reimpl composites first, ours inside):
        here we re-run OUR concat-batch D on the torch-made composite to
        pin that both composites agree."""
        both = jnp.concatenate([jnp.asarray(fake_comp_nhwc)
                                * jnp.asarray(tensors["mask_inpaint"])
                                + jnp.asarray(tensors["real"])
                                * (1 - jnp.asarray(tensors["mask_inpaint"])),
                                jnp.asarray(tensors["real"])], axis=0)
        line2 = jnp.concatenate([jnp.asarray(line)] * 2, axis=0)
        cc2 = jnp.concatenate([jnp.asarray(tensors["inputs"])] * 2, axis=0)
        logits = discriminator.apply(
            d_params, both[..., :3], line2, cc2,
            precision=jax.lax.Precision.HIGHEST)
        n = logits.shape[0] // 2
        return np.asarray(logits[:n])

    opt = {"filt_maskim": filt_maskim, "no_gan_loss": False,
           "no_vgg_loss": False, "lambda_l1": 1.0, "lambda_l1_mask": 1.0,
           "lambda_vgg": 10.0, "discriminate_fn": discriminate_fn}
    want = _torch_g_image_loss(tensors, feats, opt)

    assert set(got) == set(want) == {"GAN", "VGG", "L1c", "L1f"}
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=2e-4,
                                   err_msg=k)


def test_load_vgg_params_rejects_short_npz(tmp_path):
    """A malformed/truncated weights file must fail loudly at load time,
    not pass the trainer's `is not None` gate and crash mid-step."""
    import numpy as np
    import pytest as _pytest
    from sketchedit_tpu.train.losses import load_vgg_params
    bad = tmp_path / "short.npz"
    np.savez(bad, conv_0_w=np.zeros((3, 3, 3, 64), np.float32),
             conv_0_b=np.zeros((64,), np.float32))
    with _pytest.raises(ValueError, match="needs 16"):
        load_vgg_params(str(bad))
