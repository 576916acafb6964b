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


def test_attention_core_shared_matches_dense():
    """Shared-tensor core (Q = V, K = V*kscale derived in-kernel) vs the
    dense oracle, unaligned N, with a fully-gated sample (uniform
    softmax) so padding lanes can't leak."""
    from sketchedit_tpu.ops.attention_pallas import (
        attention_core_pallas_shared)

    rs = np.random.RandomState(5)
    B, N, D = 2, 170, 70
    V = rs.randn(B, N, D).astype(np.float32)
    kscale = (0.5 + rs.rand(B, D)).astype(np.float32)
    keep = rs.rand(B, N) > 0.4
    keep[1, :] = False
    keep = keep.astype(np.float32)

    def dense(v, ks, kp):
        k = v * ks[:, None, :]
        sim = jnp.einsum("bnd,bpd->bnp", v, k)
        w = jax.nn.softmax(sim * kp[:, None, :] * 10.0, axis=-1)
        return jnp.einsum("bnp,bpd->bnd", w, v)

    want = np.asarray(dense(*map(jnp.asarray, (V, kscale, keep))))
    ctx = pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()
    with ctx:
        got = np.asarray(attention_core_pallas_shared(
            jnp.asarray(V), jnp.asarray(kscale), jnp.asarray(keep)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_contextual_attention_shared_object_matches_xla(monkeypatch):
    """Passing the SAME array object as foreground and background (the
    released call site, editline_g.py:203-207) routes through the
    shared-tensor kernel when SKETCHEDIT_SHARED_ATTN=1; output must still
    match the XLA reference."""
    monkeypatch.setenv("SKETCHEDIT_SHARED_ATTN", "1")
    rs = np.random.RandomState(6)
    H, C = 16, 12
    f = jnp.asarray(rs.randn(2, H, H, C).astype(np.float32))
    mask = jnp.asarray((rs.rand(2, H, H, 1) > 0.5).astype(np.float32))

    want = np.asarray(contextual_attention(
        f, f, mask, precision=jax.lax.Precision.HIGHEST))
    ctx = pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()
    with ctx:
        got = np.asarray(contextual_attention_pallas(f, f, mask))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_shared_core_non_dividing_explicit_tiles():
    """Explicit tuning tiles where neither divides the other: the shared
    kernel must pad N to the lcm (regression: round_up to max floor-
    divided the q grid and silently left rows >= q_tile unwritten/NaN)."""
    from sketchedit_tpu.ops.attention_pallas import (
        attention_core_pallas_shared)

    rs = np.random.RandomState(7)
    B, N, D = 1, 384, 64
    V = rs.randn(B, N, D).astype(np.float32)
    kscale = (0.5 + rs.rand(B, D)).astype(np.float32)
    keep = (rs.rand(B, N) > 0.4).astype(np.float32)

    def dense(v, ks, kp):
        k = v * ks[:, None, :]
        sim = jnp.einsum("bnd,bpd->bnp", v, k)
        w = jax.nn.softmax(sim * kp[:, None, :] * 10.0, axis=-1)
        return jnp.einsum("bnp,bpd->bnd", w, v)

    want = np.asarray(dense(*map(jnp.asarray, (V, kscale, keep))))
    ctx = pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()
    with ctx:
        got = np.asarray(attention_core_pallas_shared(
            jnp.asarray(V), jnp.asarray(kscale), jnp.asarray(keep),
            q_tile=256, kv_tile=384))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


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


def test_attention_core_dsplit_matches_dense():
    """The D-split forward (SKETCHEDIT_DSPLIT_ATTN A/B kernel) must equal
    the dense formulation — including the split seam at D/2 and the
    q-tile/kv-tile pad edges."""
    from sketchedit_tpu.ops.attention_pallas import (
        _attention_core_dsplit_raw)
    rs = np.random.RandomState(1)
    # D=160 > Dh=128 so BOTH halves of the D-split carry real (nonzero)
    # values — at D<=128 the second half is all padding and a mis-mapped
    # half-1 out-block index would pass undetected
    B, N, P, D = 2, 130, 150, 160    # unaligned everywhere
    Q = rs.randn(B, N, D).astype(np.float32)
    K = rs.randn(B, P, D).astype(np.float32)
    V = rs.randn(B, P, D).astype(np.float32)
    keep = (rs.rand(B, P) > 0.3).astype(np.float32)

    def dense(Q, K, V, keep):
        sim = jnp.einsum("bnd,bpd->bnp", Q, K)
        w = jax.nn.softmax(sim * keep[:, None, :] * 10.0, axis=-1)
        return jnp.einsum("bnp,bpd->bnd", w, V)

    want = np.asarray(dense(*map(jnp.asarray, (Q, K, V, keep))))
    with (pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()):
        got, lse = _attention_core_dsplit_raw(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
            jnp.asarray(keep), q_tile=128, kv_tile=128, return_lse=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
    # lse must match the standard kernel's (written identically per half)
    from sketchedit_tpu.ops.attention_pallas import _attention_core_raw
    with (pltpu.force_tpu_interpret_mode() if _interpret() else _nullctx()):
        _, lse_want = _attention_core_raw(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
            jnp.asarray(keep), q_tile=128, kv_tile=128, return_lse=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_want),
                               rtol=1e-5, atol=1e-5)
