"""Pallas fused attention vs the XLA reference implementation.

On CPU the kernel runs in interpreter mode (pltpu.force_tpu_interpret_mode);
on a real TPU (bench/driver) it compiles natively. Both paths share the
same code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from sketchedit_tpu.ops.attention import contextual_attention
from sketchedit_tpu.ops.attention_pallas import (
    attention_core_pallas, contextual_attention_pallas)


def _interpret():
    return jax.devices()[0].platform != "tpu"


def test_attention_core_matches_dense():
    rs = np.random.RandomState(0)
    B, N, P, D = 2, 130, 150, 70     # deliberately unaligned
    Q = rs.randn(B, N, D).astype(np.float32)
    K = rs.randn(B, P, D).astype(np.float32)
    V = rs.randn(B, P, D).astype(np.float32)
    keep = (rs.rand(B, P) > 0.3).astype(np.float32)

    def dense(Q, K, V, keep):
        sim = jnp.einsum("bnd,bpd->bnp", Q, K)
        w = jax.nn.softmax(sim * keep[:, None, :] * 10.0, axis=-1)
        return jnp.einsum("bnp,bpd->bnd", w, V)

    want = np.asarray(dense(*map(jnp.asarray, (Q, K, V, keep))))
    ctx = pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()
    with ctx:
        got = np.asarray(attention_core_pallas(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
            jnp.asarray(keep)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_contextual_attention_pallas_matches_xla():
    rs = np.random.RandomState(1)
    H, C = 16, 12
    f = rs.randn(2, H, H, C).astype(np.float32)
    mask = (rs.rand(2, H, H, 1) > 0.5).astype(np.float32)

    want = np.asarray(contextual_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask),
        precision=jax.lax.Precision.HIGHEST))
    ctx = pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()
    with ctx:
        got = np.asarray(contextual_attention_pallas(
            jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_all_gated_uniform_weights():
    """Fully-hole mask -> all keys gated (logit 0) -> uniform attention;
    the pallas path must reproduce the exp(0) quirk, not -inf-mask it."""
    rs = np.random.RandomState(2)
    H, C = 8, 4
    f = rs.randn(1, H, H, C).astype(np.float32)
    mask = np.ones((1, H, H, 1), np.float32)
    want = np.asarray(contextual_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask),
        precision=jax.lax.Precision.HIGHEST))
    ctx = pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()
    with ctx:
        got = np.asarray(contextual_attention_pallas(
            jnp.asarray(f), jnp.asarray(f), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_fwd_tile_selection_respects_out_dtype():
    """bf16 streams get 512-row q tiles ONLY with a narrow out dtype; the
    differentiated path's f32 write-out must halve them — 512+f32 blows
    the 16M scoped-VMEM limit at D=1536 (256^2 training failed to
    compile)."""
    import jax.numpy as jnp
    from sketchedit_tpu.ops.attention_pallas import _fwd_tiles
    assert _fwd_tiles(jnp.bfloat16, jnp.bfloat16, 4096, 4096)[0] == 512
    assert _fwd_tiles(jnp.bfloat16, jnp.float32, 4096, 4096)[0] == 256
    assert _fwd_tiles(jnp.float32, jnp.float32, 4096, 4096)[0] == 128
