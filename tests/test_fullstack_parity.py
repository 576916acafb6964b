"""Full-stack parity: our data loader + pipeline vs the reference's
preprocessing + model, on a real bundled image/sketch pair.

Covers the PIL->tensor path (ToTensor + Normalize, sketch resize +
binarize — testimage_dataset.py:51-103) plus the model, with shared
random weights. torchvision isn't installed, so its two transforms are
restated inline (they are exactly uint8/255 then (x-.5)/.5).
"""

import os

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from sketchedit_tpu.data.testimage import TestImageDataset
from sketchedit_tpu.models import editline2
from sketchedit_tpu.params.torch_convert import state_dict_to_params
from torch_oracle import add_reference_to_path, reference_opt, to_nhwc

REF_IMAGES = "/root/reference/datasets/face_release/images"
REF_EDGES = "/root/reference/datasets/face_release/edges"
REF_LIST = "/root/reference/datasets/face_release/list.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_IMAGES), reason="reference fixtures unavailable")


def _torch_load_pair(img_path, sk_path):
    """The reference's exact preprocessing, restated."""
    image = Image.open(img_path).convert("RGB")
    w, h = image.size
    arr = np.asarray(image, np.float32) / 255.0          # ToTensor
    img_t = torch.from_numpy(((arr - 0.5) / 0.5).transpose(2, 0, 1))[None]
    sk = Image.open(sk_path).convert("L").resize((w, h))
    sk_t = (torch.from_numpy(
        np.asarray(sk, np.float32) / 255.0)[None, None] > 0).float()
    return img_t, sk_t


def test_loader_matches_reference_preprocessing(tmp_path):
    import argparse
    opt = argparse.Namespace(
        image_dirs=REF_IMAGES, mask_dirs=REF_EDGES, image_lists=REF_LIST,
        image_postfix=".png", mask_postfix=".png", output_labels=None,
        output_dir=str(tmp_path), output_mask_dir=None)
    ds = TestImageDataset()
    ds.initialize(opt)
    assert len(ds) == 4
    sample = ds[0]
    img_t, sk_t = _torch_load_pair(ds.image_paths[0], ds.mask_paths[0])
    np.testing.assert_allclose(sample["image"], to_nhwc(img_t)[0],
                               atol=1e-6)
    np.testing.assert_array_equal(sample["mask"][:, :, 0],
                                  sk_t[0, 0].numpy())


def test_end_to_end_parity_on_bundled_image(tmp_path):
    """Loader -> jitted edit vs reference preprocessing -> reference model,
    shared random weights, on a real 256x256 celeb image + sketch."""
    add_reference_to_path()
    from models.networks.editline2_g import MDGenerator
    from models.networks.editline_g import DeepFillC2Generator

    opt_t = reference_opt()
    g = torch.Generator().manual_seed(7)
    netM = MDGenerator(opt_t)
    netG = DeepFillC2Generator(opt_t)
    for net in (netM, netG):
        state = net.state_dict()
        for k in state:
            state[k] = torch.randn(state[k].shape, generator=g) * 0.05
        net.load_state_dict(state)
        net.eval()
    params = {"M": state_dict_to_params(netM.state_dict()),
              "G": state_dict_to_params(netG.state_dict())}

    import argparse
    opt = argparse.Namespace(
        image_dirs=REF_IMAGES, mask_dirs=REF_EDGES, image_lists=REF_LIST,
        image_postfix=".png", mask_postfix=".png", output_labels=None,
        output_dir=str(tmp_path), output_mask_dir=None)
    ds = TestImageDataset()
    ds.initialize(opt)
    sample = ds[0]

    composed_j, mask_j = editline2.edit(
        params, jnp.asarray(sample["image"][None]),
        jnp.asarray(sample["mask"][None]))

    img_t, sk_t = _torch_load_pair(ds.image_paths[0], ds.mask_paths[0])
    with torch.no_grad():
        mask_t, _ = netM(img_t, sk_t)
        hard = (mask_t > 0.5).float()
        _, fake_t = netG(img_t, img_t, hard, hard, sk_t)
        composed_t = fake_t * mask_t + img_t * (1 - mask_t)

    l1 = float(np.abs(np.asarray(composed_j) - to_nhwc(composed_t)).mean())
    assert l1 < 1e-3, f"composed L1 {l1} exceeds the parity budget"
