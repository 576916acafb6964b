"""Parity tests for contextual attention vs torch oracle and vs the actual
reference splitcam modules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from sketchedit_tpu.ops.attention import (
    contextual_attention, extract_patches, fold_patches, patch_valid_ratio)
from torch_oracle import (
    torch_contextual_attention, to_nchw, to_nhwc, add_reference_to_path)


def test_extract_patches_matches_unfold():
    x = np.random.RandomState(0).randn(2, 16, 16, 5).astype(np.float32)
    got = extract_patches(jnp.asarray(x), 4, 2)   # (B, nh, nw, k, k, C)
    assert got.shape == (2, 7, 7, 4, 4, 5)
    # torch unfold layout: (B, C*k*k, P) with C outermost, then ky, kx
    import torch.nn.functional as F
    uf = F.unfold(to_nchw(x), kernel_size=(4, 4), stride=2)
    uf = uf.view(2, 5, 4, 4, 49).permute(0, 4, 2, 3, 1).numpy()  # B,P,k,k,C
    np.testing.assert_allclose(
        np.asarray(got).reshape(2, 49, 4, 4, 5), uf, rtol=1e-6, atol=1e-6)


def test_fold_is_overlap_add_inverse():
    x = np.random.RandomState(1).randn(1, 8, 8, 3).astype(np.float32)
    p = extract_patches(jnp.asarray(x), 4, 2)
    folded = fold_patches(p, (8, 8), 2)
    # interior pixels are covered by exactly 4 patches (k=4, s=2)
    np.testing.assert_allclose(np.asarray(folded)[0, 3:5, 3:5],
                               4 * x[0, 3:5, 3:5], rtol=1e-5)


def test_patch_valid_ratio():
    valid = np.zeros((1, 8, 8, 1), np.float32)
    valid[0, :4] = 1.0   # top half valid
    r = np.asarray(patch_valid_ratio(jnp.asarray(valid), 4, 2))
    assert r.shape == (1, 9)
    np.testing.assert_allclose(r[0, :3], 1.0)    # top row patches all valid
    np.testing.assert_allclose(r[0, 3:6], 0.5)   # middle straddles
    np.testing.assert_allclose(r[0, 6:], 0.0)


@pytest.mark.parametrize("H,C", [(16, 8), (32, 96)])
def test_attention_matches_torch_oracle(H, C):
    rs = np.random.RandomState(2)
    f = rs.randn(2, H, H, C).astype(np.float32)
    mask = (rs.rand(2, H, H, 1) > 0.6).astype(np.float32)

    got = np.asarray(contextual_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask),
        precision=jax.lax.Precision.HIGHEST))
    want = to_nhwc(torch_contextual_attention(
        to_nchw(f), to_nchw(f), to_nchw(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attention_matches_reference_splitcam():
    """Drive the actual reference ReduceContextAttentionP1/P2 modules."""
    add_reference_to_path()
    from models.networks.splitcam import (
        ReduceContextAttentionP1, ReduceContextAttentionP2)

    cam1 = ReduceContextAttentionP1(nn_hard=False, ufstride=2, stride=2,
                                    bkg_patch_size=4, pd=0, is_th=True,
                                    th=0.1, norm_type=1)
    cam2 = ReduceContextAttentionP2(ufstride=2, bkg_patch_size=4, stride=2,
                                    pd=0, mk=False)
    rs = np.random.RandomState(3)
    H, C = 16, 12
    f = rs.randn(2, H, H, C).astype(np.float32)
    mask = (rs.rand(2, H, H, 1) > 0.5).astype(np.float32)

    with torch.no_grad():
        ft = to_nchw(f)
        mt = to_nchw(mask)
        sim = cam1(ft, ft, mt)
        out_ref, _ = cam2(sim, ft, mt, {})
    got = np.asarray(contextual_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask),
        precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(got, to_nhwc(out_ref), rtol=1e-4, atol=1e-4)


# --- full splitcam configuration space vs the reference modules -------------

_VARIANTS = {
    # name: constructor overrides (shared by P1/P2 where applicable)
    "released": {},
    "nn_hard": {"nn_hard": True},
    "is_th_false": {"is_th": False},
    "mk_true": {"mk": True},
    "pd1": {"pd": 1},
    "norm_type2": {"norm_type": 2},
    # fuse needs the patch grid to equal (h/2, w/2) for the reference's
    # hardcoded view (splitcam.py:71,78) — pd=1 with k=4, ufstride=2 does
    "fuse": {"pd": 1, "is_fuse": True},
    "everything": {"pd": 1, "is_fuse": True, "is_th": False, "mk": True,
                   "nn_hard": True, "norm_type": 2, "th": 0.3},
}


def _reference_splitcam(f, mask, ov):
    add_reference_to_path()
    from models.networks.splitcam import (
        ReduceContextAttentionP1, ReduceContextAttentionP2)
    cam1 = ReduceContextAttentionP1(
        nn_hard=ov.get("nn_hard", False), ufstride=2, stride=2,
        bkg_patch_size=4, pd=ov.get("pd", 0), is_th=ov.get("is_th", True),
        is_fuse=ov.get("is_fuse", False), th=ov.get("th", 0.1),
        norm_type=ov.get("norm_type", 1))
    cam2 = ReduceContextAttentionP2(
        ufstride=2, bkg_patch_size=4, stride=2, pd=ov.get("pd", 0),
        mk=ov.get("mk", False))
    with torch.no_grad():
        ft = to_nchw(f)
        mt = to_nchw(mask)
        sim = cam1(ft, ft, mt)
        out, aux = cam2(sim, ft, mt, {})
    return to_nhwc(out), to_nhwc(aux["hole"])


@pytest.mark.parametrize("name", sorted(_VARIANTS))
def test_splitcam_variants_match_reference(name):
    """Every reachable ReduceContextAttentionP1/P2 configuration, pinned
    against the actual reference modules (splitcam.py:8-15,73-103,132-145,
    161-163)."""
    from sketchedit_tpu.ops.attention import (
        SplitCAMConfig, splitcam_attention)
    ov = _VARIANTS[name]
    rs = np.random.RandomState(7)
    H, C = 16, 12
    f = rs.randn(2, H, H, C).astype(np.float32)
    mask = (rs.rand(2, H, H, 1) > 0.5).astype(np.float32)

    want, want_recon = _reference_splitcam(f, mask, ov)
    cfg = SplitCAMConfig(**ov)
    got, got_recon = splitcam_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask), cfg,
        precision=jax.lax.Precision.HIGHEST, return_recon=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_recon), want_recon,
                               rtol=1e-4, atol=1e-4)


def test_netg_routes_nonreleased_attention_config():
    """DeepFillConfig.attention reaches the general splitcam path inside the
    full generator (smoke: shapes + finiteness at a non-released config)."""
    from sketchedit_tpu.models import deepfill_c2
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    from sketchedit_tpu.ops.attention import SplitCAMConfig
    rs = np.random.RandomState(9)
    B, H = 1, 32
    params = deepfill_c2.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rs.uniform(-1, 1, (B, H, H, 3)).astype(np.float32))
    m = jnp.asarray((rs.rand(B, H, H, 1) > 0.7).astype(np.float32))
    cfg = DeepFillConfig(attention=SplitCAMConfig(pd=1, mk=True,
                                                  nn_hard=True))
    coarse, fake = deepfill_c2.apply(params, x, x, m, m, config=cfg)
    assert fake.shape == (B, H, H, 3)
    assert np.isfinite(np.asarray(fake)).all()


def test_splitcam_released_config_equals_fast_path():
    """SplitCAMConfig() == the dedicated fast path (and so the Pallas
    kernel, which test_attention_pallas pins to it)."""
    from sketchedit_tpu.ops.attention import (
        SplitCAMConfig, splitcam_attention)
    rs = np.random.RandomState(8)
    f = rs.randn(2, 16, 16, 8).astype(np.float32)
    mask = (rs.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
    a = splitcam_attention(jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask),
                           SplitCAMConfig(),
                           precision=jax.lax.Precision.HIGHEST)
    b = contextual_attention(jnp.asarray(f), jnp.asarray(f),
                             jnp.asarray(mask),
                             precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    assert SplitCAMConfig().is_released
    assert not SplitCAMConfig(pd=1).is_released


def test_gated_patches_still_contribute_to_softmax():
    """The reference multiplies gated similarities by 0 *before* softmax, so a
    fully-gated row degenerates to uniform weights — assert we reproduce that
    rather than -inf masking."""
    H, C = 8, 4
    f = np.random.RandomState(4).randn(1, H, H, C).astype(np.float32)
    mask = np.ones((1, H, H, 1), np.float32)   # everything is hole => no valid patch
    out, w = contextual_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask), return_weights=True)
    P = w.shape[-1]
    np.testing.assert_allclose(np.asarray(w), 1.0 / P, rtol=1e-6)


def test_attention_preserves_bf16_dtype():
    """bf16 callers must get bf16 back from every attention impl — the
    XLA/sharded paths promoting to f32 silently undid mixed precision for
    the whole stage-2 tail."""
    import jax
    from sketchedit_tpu.ops.attention import (
        contextual_attention, splitcam_attention, SplitCAMConfig)
    rs = np.random.RandomState(0)
    f = jnp.asarray(rs.randn(1, 8, 8, 4), dtype=jnp.bfloat16)
    mask = jnp.asarray((rs.rand(1, 8, 8, 1) > 0.5).astype(np.float32))
    assert contextual_attention(f, f, mask).dtype == jnp.bfloat16
    assert splitcam_attention(f, f, mask, SplitCAMConfig()).dtype \
        == jnp.bfloat16
