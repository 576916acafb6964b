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
