"""Exactness of the space-to-depth packed conv algebra vs the unpacked ops.

The model parity tests pin the packed paths transitively (they run at
B<64); these pin each packed rewrite directly against the plain gated-conv
chain it replaces, at fp32/HIGHEST where the algebra is exact to roundoff.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchedit_tpu.ops.gated_conv import (
    gated_conv2d, gated_deconv2d, init_conv_params)
from sketchedit_tpu.ops.packed_tail import (
    packed_decoder_tail, packed_decoder_tail5, packed_encoder_front,
    use_packing)

HI = jax.lax.Precision.HIGHEST


def _p(key, cin, cout, k=3):
    return init_conv_params(key, cin, cout, k, init_type="kaiming",
                            dtype=jnp.float32)


def test_packed_decoder_tail_exact():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    p_up, p_mid, p_head = _p(ks[0], 24, 24), _p(ks[1], 12, 12), _p(ks[2], 6, 3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 24),
                    jnp.float32)
    want = gated_conv2d(p_head, gated_conv2d(
        p_mid, gated_deconv2d(p_up, x, precision=HI), precision=HI),
        activation=None, precision=HI)
    got = packed_decoder_tail(p_up, p_mid, p_head, x, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_decoder_tail5_exact():
    """conv13_up..conv17 (both upsamples) on packed grids == the plain
    chain, including the composed pack2(G)->pack2(2G) deconv kernel."""
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    # deepfill tail widths: 96->96(up) 48->96 48->48(up) 24->24 12->3
    p13, p14 = _p(ks[0], 96, 96), _p(ks[1], 48, 96)
    p15, p16, p17 = _p(ks[2], 48, 48), _p(ks[3], 24, 24), _p(ks[4], 12, 3)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 96),
                    jnp.float32)
    h = gated_deconv2d(p13, x, precision=HI)
    h = gated_conv2d(p14, h, precision=HI)
    h = gated_deconv2d(p15, h, precision=HI)
    h = gated_conv2d(p16, h, precision=HI)
    want = gated_conv2d(p17, h, activation=None, precision=HI)
    got = packed_decoder_tail5(p13, p14, p15, p16, p17, x, precision=HI)
    assert got.shape == want.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k1", [3, 5])
def test_packed_encoder_front_exact(k1):
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    p1 = _p(ks[0], 4, 48, k=k1)
    p2 = _p(ks[1], 24, 96)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 4),
                    jnp.float32)
    want = gated_conv2d(p2, gated_conv2d(p1, x, precision=HI), stride=2,
                        precision=HI)
    got = packed_encoder_front(p1, p2, x, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_use_packing_env_override(monkeypatch):
    monkeypatch.delenv("SKETCHEDIT_PACK", raising=False)
    assert use_packing(16) and not use_packing(128)
    monkeypatch.setenv("SKETCHEDIT_PACK", "0")
    assert not use_packing(16)
    monkeypatch.setenv("SKETCHEDIT_PACK", "1")
    assert use_packing(128)
