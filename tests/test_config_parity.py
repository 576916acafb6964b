"""Parity across the netG flag surface: every DeepFillC2 configuration the
reference exposes (--pool_type, --no_mask_cc, --no_mask_coarse,
--joint_train_inp) must match the reference module bit-for-bit in behavior,
not just the released-checkpoint config."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sketchedit_tpu.models import deepfill_c2
from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
from sketchedit_tpu.params.torch_convert import state_dict_to_params
from torch_oracle import add_reference_to_path, reference_opt, to_nchw, to_nhwc

HIGH = jax.lax.Precision.HIGHEST


import itertools


@pytest.mark.parametrize(
    "use_cam,pool_type,no_mask_cc,no_mask_coarse,joint",
    # EXHAUSTIVE: the full reachable netG flag space (2^5 = 32 combos,
    # incl. use_cam=False which disables the attention branch entirely —
    # editline_g.py:203-210)
    list(itertools.product([True, False], ["max", "avg"], [False, True],
                           [False, True], [True, False])))
def test_deepfill_flag_parity(use_cam, pool_type, no_mask_cc,
                              no_mask_coarse, joint):
    add_reference_to_path()
    from models.networks.editline_g import DeepFillC2Generator

    opt = reference_opt(use_cam=use_cam, pool_type=pool_type,
                        no_mask_cc=no_mask_cc,
                        no_mask_coarse=no_mask_coarse,
                        joint_train_inp=joint)
    g = torch.Generator().manual_seed(11)
    net = DeepFillC2Generator(opt)
    state = net.state_dict()
    for k in state:
        state[k] = torch.randn(state[k].shape, generator=g) * 0.05
    net.load_state_dict(state)
    net.eval()
    params = state_dict_to_params(net.state_dict())

    cfg = DeepFillConfig(use_cam=use_cam, pool_type=pool_type,
                         no_mask_cc=no_mask_cc,
                         no_mask_coarse=no_mask_coarse,
                         joint_train_inp=joint, attention_impl="xla")

    rs = np.random.RandomState(5)
    img = rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    sketch = (rs.rand(1, 32, 32, 1) > 0.9).astype(np.float32)
    mask = np.zeros((1, 32, 32, 1), np.float32)
    mask[:, 8:24, 8:24] = 1.0

    s1_j, s2_j = deepfill_c2.apply(
        params, jnp.asarray(img), jnp.asarray(img), jnp.asarray(mask),
        jnp.asarray(mask), jnp.asarray(sketch), config=cfg, precision=HIGH)
    with torch.no_grad():
        s1_t, s2_t = net(to_nchw(img), to_nchw(img), to_nchw(mask),
                         to_nchw(mask), to_nchw(sketch))
    np.testing.assert_allclose(np.asarray(s1_j), to_nhwc(s1_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2_j), to_nhwc(s2_t),
                               rtol=1e-4, atol=2e-5)


def test_deepfill_no_guide_uses_ones():
    """guide=None must feed a ones channel (editline_g.py:127-128)."""
    add_reference_to_path()
    from models.networks.editline_g import DeepFillC2Generator
    opt = reference_opt()
    g = torch.Generator().manual_seed(13)
    net = DeepFillC2Generator(opt)
    state = net.state_dict()
    for k in state:
        state[k] = torch.randn(state[k].shape, generator=g) * 0.05
    net.load_state_dict(state)
    net.eval()
    params = state_dict_to_params(net.state_dict())

    rs = np.random.RandomState(6)
    img = rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = (rs.rand(1, 32, 32, 1) > 0.7).astype(np.float32)

    _, s2_j = deepfill_c2.apply(
        params, jnp.asarray(img), jnp.asarray(img), jnp.asarray(mask),
        jnp.asarray(mask), None, precision=HIGH)
    with torch.no_grad():
        _, s2_t = net(to_nchw(img), to_nchw(img), to_nchw(mask),
                      to_nchw(mask), None)
    np.testing.assert_allclose(np.asarray(s2_j), to_nhwc(s2_t),
                               rtol=1e-4, atol=2e-5)
