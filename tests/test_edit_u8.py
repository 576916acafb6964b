"""Fused uint8 path: edit_u8 must match the float path's round-tripped
uint8 outputs exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from sketchedit_tpu.models import editline2


def test_edit_u8_matches_float_path():
    params = editline2.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    img_u8 = (rs.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    sk_u8 = ((rs.rand(1, 32, 32, 1) > 0.9) * 255).astype(np.uint8)

    comp_u8, mask_u8 = editline2.edit_u8(
        params, jnp.asarray(img_u8), jnp.asarray(sk_u8))
    assert comp_u8.dtype == jnp.uint8 and mask_u8.dtype == jnp.uint8

    image = img_u8.astype(np.float32) / 127.5 - 1.0
    sketch = (sk_u8 > 0).astype(np.float32)
    comp_f, mask_f = editline2.edit(
        params, jnp.asarray(image), jnp.asarray(sketch))
    want_comp = np.round(
        (np.clip(np.asarray(comp_f), -1, 1) + 1) * 127.5).astype(np.uint8)
    want_mask = np.round(
        np.clip(np.asarray(mask_f), 0, 1) * 255).astype(np.uint8)

    # identical math modulo the final rounding ULP
    assert np.abs(comp_u8.astype(int) - want_comp.astype(int)).max() <= 1
    assert np.abs(mask_u8.astype(int) - want_mask.astype(int)).max() <= 1


def test_runner_pipeline_accepts_uint8():
    import argparse
    from sketchedit_tpu.runner import build_pipeline
    opt = argparse.Namespace(
        checkpoints_dir="/nonexistent", name="x", which_epoch="latest",
        use_cam=True, pool_type="max", no_mask_cc=False,
        no_mask_coarse=False, joint_train_inp=True, attention_impl="xla",
        precision="highest", compute_dtype="float32", data_parallel=1,
        init_type="xavier", init_variance=0.02)
    pipe = build_pipeline(opt)
    rs = np.random.RandomState(0)
    img_u8 = (rs.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    sk_u8 = ((rs.rand(1, 32, 32, 1) > 0.9) * 255).astype(np.uint8)
    comp, mask = pipe(img_u8, sk_u8)
    assert comp.dtype == np.uint8
    assert comp.shape == (1, 32, 32, 3)
