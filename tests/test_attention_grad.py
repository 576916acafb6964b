"""Gradient parity: the pallas attention path (custom VJP) must match the
dense XLA path's gradients — training uses the same kernel as inference."""

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from sketchedit_tpu.ops.attention import contextual_attention
from sketchedit_tpu.ops.attention_pallas import contextual_attention_pallas


def _interpret():
    return jax.devices()[0].platform != "tpu"


def test_attention_gradients_match():
    rs = np.random.RandomState(0)
    H, C = 12, 8
    f = jnp.asarray(rs.randn(2, H, H, C).astype(np.float32))
    mask = jnp.asarray((rs.rand(2, H, H, 1) > 0.5).astype(np.float32))

    def loss_xla(f):
        return jnp.sum(contextual_attention(
            f, f, mask, precision=jax.lax.Precision.HIGHEST) ** 2)

    def loss_pallas(f):
        return jnp.sum(contextual_attention_pallas(f, f, mask) ** 2)

    g_xla = jax.grad(loss_xla)(f)
    ctx = (pltpu.force_tpu_interpret_mode() if _interpret()
           else _null())
    with ctx:
        g_pal = jax.grad(loss_pallas)(f)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=5e-3, atol=5e-4)


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_core_gradients_match_dense_unaligned():
    """dQ/dK/dV from the Pallas flash backward vs the dense-XLA gradients,
    on deliberately tile-unaligned shapes with heavy gating (some rows
    fully gated => uniform softmax; padding lanes must not leak)."""
    from sketchedit_tpu.ops.attention_pallas import attention_core_pallas

    rs = np.random.RandomState(3)
    B, N, P, D = 2, 130, 150, 70
    Q = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    K = jnp.asarray(rs.randn(B, P, D).astype(np.float32))
    V = jnp.asarray(rs.randn(B, P, D).astype(np.float32))
    keep = rs.rand(B, P) > 0.5
    keep[0, :] = False                    # one sample fully gated
    keep = jnp.asarray(keep.astype(np.float32))
    cot = jnp.asarray(rs.randn(B, N, D).astype(np.float32))

    def loss_dense(q, k, v):
        sim = jnp.einsum("bnd,bpd->bnp", q, k,
                         precision=jax.lax.Precision.HIGHEST)
        w = jax.nn.softmax(sim * keep[:, None, :] * 10.0, axis=-1)
        out = jnp.einsum("bnp,bpd->bnd", w, v,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(out * cot)

    def loss_pallas(q, k, v):
        return jnp.sum(attention_core_pallas(q, k, v, keep) * cot)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(Q, K, V)
    ctx = (pltpu.force_tpu_interpret_mode() if _interpret() else _null())
    with ctx:
        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(Q, K, V)
    for name, g, w in zip("QKV", got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_core_gradients_bf16_track_f32():
    """The bf16 training path's gradients must track the f32 dense gradients
    to bf16 rounding — pins the exact configuration mixed-precision training
    runs (bf16 Q/K/V streams, f32 softmax state, f32 out residual for
    delta = rowsum(dO*O))."""
    from sketchedit_tpu.ops.attention_pallas import attention_core_pallas

    rs = np.random.RandomState(7)
    B, N, P, D = 2, 128, 128, 64
    Qf = rs.randn(B, N, D).astype(np.float32)
    Kf = rs.randn(B, P, D).astype(np.float32)
    Vf = rs.randn(B, P, D).astype(np.float32)
    keep = jnp.asarray((rs.rand(B, P) > 0.3).astype(np.float32))
    cot = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    Q, K, V = (jnp.asarray(x, dtype=jnp.bfloat16) for x in (Qf, Kf, Vf))

    def loss_dense(q, k, v):
        sim = jnp.einsum("bnd,bpd->bnp", q, k,
                         precision=jax.lax.Precision.HIGHEST)
        w = jax.nn.softmax(sim * keep[:, None, :] * 10.0, axis=-1)
        out = jnp.einsum("bnp,bpd->bnd", w, v,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(out * cot)

    def loss_pallas(q, k, v):
        return jnp.sum(attention_core_pallas(q, k, v, keep).astype(
            jnp.float32) * cot)

    # dense oracle on the SAME rounded values, in f32
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(
        *(x.astype(jnp.float32) for x in (Q, K, V)))
    ctx = (pltpu.force_tpu_interpret_mode() if _interpret() else _null())
    with ctx:
        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(Q, K, V)
    for name, g, w in zip("QKV", got, want):
        scale = np.abs(np.asarray(w)).max()
        np.testing.assert_allclose(np.asarray(g, dtype=np.float32),
                                   np.asarray(w), rtol=0.05,
                                   atol=0.02 * scale, err_msg=name)


def test_shared_core_gradients_match_dense():
    """dV/dkscale from the shared-tensor VJP (Q = V, K = V*kscale derived
    in-kernel) vs dense-XLA gradients, unaligned N with a fully-gated
    sample. Pins the fold-back algebra dV = dQ + dV + dK*kscale and
    dkscale = sum_P dK*V."""
    from sketchedit_tpu.ops.attention_pallas import (
        attention_core_pallas_shared)

    rs = np.random.RandomState(11)
    B, N, D = 2, 170, 70
    V = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    ks = jnp.asarray((0.5 + rs.rand(B, D)).astype(np.float32))
    keep = rs.rand(B, N) > 0.4
    keep[1, :] = False
    keep = jnp.asarray(keep.astype(np.float32))
    cot = jnp.asarray(rs.randn(B, N, D).astype(np.float32))

    def loss_dense(v, s):
        k = v * s[:, None, :]
        sim = jnp.einsum("bnd,bpd->bnp", v, k,
                         precision=jax.lax.Precision.HIGHEST)
        w = jax.nn.softmax(sim * keep[:, None, :] * 10.0, axis=-1)
        out = jnp.einsum("bnp,bpd->bnd", w, v,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(out * cot)

    def loss_pallas(v, s):
        return jnp.sum(attention_core_pallas_shared(v, s, keep) * cot)

    want = jax.grad(loss_dense, argnums=(0, 1))(V, ks)
    ctx = (pltpu.force_tpu_interpret_mode() if _interpret() else _null())
    with ctx:
        got = jax.grad(loss_pallas, argnums=(0, 1))(V, ks)
    for name, g, w in zip(("V", "kscale"), got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)
