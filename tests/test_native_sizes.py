"""Native (non-/8) input sizes must flow through edit() on every attention
impl — the pipeline edge-pads to the next /8 and crops the outputs back.

The reference hard-CRASHES on these sizes: with use_cam the attention fold
emits an (H/4 - 1) feature grid that fails the stage-2 concat
(editline_g.py:203-210; verified live — 252x252 raises "Expected size 63
but got size 62"). Accepting them is a capability delta in our favor,
documented in docs/PARITY.md.
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from sketchedit_tpu.models import editline2
from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
from sketchedit_tpu.models.editline2 import EditLine2Config


@pytest.fixture(scope="module")
def params():
    return editline2.init_params(jax.random.PRNGKey(0))


def _inputs(h, w, seed=0):
    rs = np.random.RandomState(seed)
    img = (rs.rand(1, h, w, 3).astype(np.float32) * 2 - 1)
    sk = (rs.rand(1, h, w, 1) > 0.92).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(sk)


@pytest.mark.parametrize("h,w", [(36, 36), (20, 28), (27, 33)])
def test_edit_nonmultiple_sizes(params, h, w):
    """Sizes that are /4-not-/8 (36), mixed (20x28), and not even /4
    (27x33) all run and return input-shaped outputs."""
    img, sk = _inputs(h, w)
    comp, soft = editline2.edit(params, img, sk)
    assert comp.shape == (1, h, w, 3)
    assert soft.shape == (1, h, w, 1)
    assert np.isfinite(np.asarray(comp)).all()


def test_edit_matches_manual_pad_crop(params):
    """edit() at a non-/8 size equals cropping an explicitly /8-padded run
    (same program; proves the wiring, including the composite using the
    ORIGINAL image in the interior)."""
    h, w = 36, 28
    img, sk = _inputs(h, w, seed=1)
    comp, soft = editline2.edit(params, img, sk)

    ph, pw = (-h) % 8, (-w) % 8
    img_p = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    sk_p = jnp.pad(sk, ((0, 0), (0, ph), (0, pw), (0, 0)))
    comp_p, soft_p = editline2.edit(params, img_p, sk_p)

    np.testing.assert_allclose(np.asarray(soft), np.asarray(soft_p)[:, :h, :w],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(comp_p)[:, :h, :w],
                               atol=1e-6)


def test_edit_aligned_sizes_unchanged(params):
    """/8-aligned inputs take the no-pad fast path (bitwise identical to a
    direct generate+composite)."""
    img, sk = _inputs(32, 32, seed=2)
    comp, soft = editline2.edit(params, img, sk)
    out = editline2.generate(params, img, sk)
    want = out["fake"] * out["mask"] + img * (1.0 - out["mask"])
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(want))


def test_edit_nonmultiple_pallas_interpret(params):
    """The Pallas attention path no longer raises on non-/8 inputs: the
    upstream pad keeps its space-to-depth patch grid even. Interpreter
    mode on CPU; must match the xla impl <1e-3 (VERDICT r3 item 1)."""
    img, sk = _inputs(36, 36, seed=3)
    cfg_x = EditLine2Config(netg=DeepFillConfig(attention_impl="xla"))
    cfg_p = EditLine2Config(netg=DeepFillConfig(attention_impl="pallas"))
    want, _ = editline2.edit(params, img, sk, config=cfg_x)
    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else contextlib.nullcontext())
    with ctx:
        got, _ = editline2.edit(params, img, sk, config=cfg_p)
    assert got.shape == (1, 36, 36, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_pipeline_nonmultiple_u8(params):
    """The runner pipeline (uint8 program) accepts native sizes too."""
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
    img_u8 = (rs.rand(1, 36, 28, 3) * 255).astype(np.uint8)
    sk_u8 = ((rs.rand(1, 36, 28, 1) > 0.9) * 255).astype(np.uint8)
    comp, mask = pipe(img_u8, sk_u8)
    assert comp.shape == (1, 36, 28, 3) and comp.dtype == np.uint8
    assert mask.shape == (1, 36, 28, 1)
