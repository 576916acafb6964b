"""Mesh/sharding tests on the virtual CPU device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchedit_tpu.parallel.mesh import (
    data_parallel_mesh, replicate, shard_batch)


def test_data_parallel_mesh_basics():
    n = len(jax.devices())
    mesh = data_parallel_mesh(n)
    assert mesh.shape["data"] == n
    x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == n
    params = {"w": jnp.ones((3, 3))}
    pr = replicate(mesh, params)
    assert pr["w"].sharding.is_fully_replicated


def test_sharded_attention_matches_dense():
    from sketchedit_tpu.ops.attention import contextual_attention
    from sketchedit_tpu.parallel.sharded_attention import (
        contextual_attention_sharded, patch_mesh)
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    # patch grid (H-4)/2+1 per side must divide n: H=18 -> 8x8=64 patches
    H, C = 18, 6
    rs = np.random.RandomState(0)
    f = jnp.asarray(rs.randn(2, H, H, C).astype(np.float32))
    mask = jnp.asarray((rs.rand(2, H, H, 1) > 0.5).astype(np.float32))

    mesh = patch_mesh(n)
    got = np.asarray(contextual_attention_sharded(f, f, mask, mesh))
    want = np.asarray(contextual_attention(
        f, f, mask, precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_editline2_forward_modes():
    from sketchedit_tpu.models import editline2
    params = editline2.init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(
            rs.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)),
        "mask": jnp.asarray(
            (rs.rand(1, 32, 32, 1) > 0.9).astype(np.float32)),
    }
    composed, mask = editline2.forward(params, data, "inference")
    assert composed.shape == (1, 32, 32, 3)
    vis = editline2.forward(params, data, "visualize")
    assert set(vis) == {"mask", "maskim", "coarse", "fine", "composed"}
    np.testing.assert_allclose(np.asarray(vis["composed"]),
                               np.asarray(composed), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        editline2.forward(params, data, "generator")


def test_netg_sharded_attention_matches_xla():
    """The full generator with attention_impl='sharded' over the 8-device
    patch mesh equals the XLA path — at a resolution whose patch count is
    NOT divisible by the mesh (exercises the query-axis padding)."""
    from sketchedit_tpu.models import deepfill_c2
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    from sketchedit_tpu.parallel.sharded_attention import patch_mesh

    rs = np.random.RandomState(11)
    B, H = 1, 64          # feature grid 16 -> P = 49, not divisible by 8
    params = deepfill_c2.init_params(jax.random.PRNGKey(2))
    x = jnp.asarray(rs.uniform(-1, 1, (B, H, H, 3)).astype(np.float32))
    m = jnp.asarray((rs.rand(B, H, H, 1) > 0.7).astype(np.float32))

    want = deepfill_c2.apply(
        params, x, x, m, m,
        config=DeepFillConfig(attention_impl="xla"))[1]
    mesh = patch_mesh(8)
    got = deepfill_c2.apply(
        params, x, x, m, m,
        config=DeepFillConfig(attention_impl="sharded",
                              attention_mesh=mesh))[1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
