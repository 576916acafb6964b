"""Single-blob batch transfer: host pack / device unpack roundtrip and
train-step numerical equivalence with the float batch path."""

import numpy as np
import jax
import jax.numpy as jnp

from sketchedit_tpu.data.packed_transfer import (
    MASK_KEYS, mask_keys, pack_batch, packable, unpack_batch)


def _compact_batch(rs, B=2, H=16, W=16):
    return {
        "image": (rs.rand(B, H, W, 3) * 255).astype(np.uint8),
        "mask": rs.rand(B, H, W, 1) > 0.9,
        "edgegt": rs.rand(B, H, W, 1) > 0.8,
        "random_mask": rs.rand(B, H, W, 1) > 0.7,
        "random_mask2": rs.rand(B, H, W, 1) > 0.6,
        "path": ["a", "b"],
        "valid": 2,
    }


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(0)
    batch = _compact_batch(rs)
    assert packable(batch)
    blob = pack_batch(batch)
    assert blob.dtype == np.uint8
    assert blob.shape == (2, 16 * 16 * 3 + 16 * 16 * 4 // 8)
    out = unpack_batch(jnp.asarray(blob), 16, 16)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    for k in MASK_KEYS:
        np.testing.assert_array_equal(
            np.asarray(out[k]), batch[k].astype(np.uint8))


def test_pack_unpack_roundtrip_odd_pixels():
    """np.packbits pads each row to a byte boundary; an odd H*W (e.g. a
    255 crop) must round-trip exactly — the device unpack drops the pad
    bits before the spatial reshape (regression: reshape size-mismatch)."""
    rs = np.random.RandomState(7)
    H = W = 15                              # H*W*4 = 900 bits -> 113 bytes
    batch = _compact_batch(rs, B=2, H=H, W=W)
    out = unpack_batch(jnp.asarray(pack_batch(batch)), H, W)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    for k in MASK_KEYS:
        assert np.asarray(out[k]).dtype == np.bool_
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])


def test_pack_unpack_optional_region_gt():
    """The optional 'region_gt' plane (editimage's --lambda_mask_rec
    supervision target) packs after the core four and round-trips; the
    unpack must be specialized on mask_keys(batch)."""
    rs = np.random.RandomState(11)
    batch = _compact_batch(rs)
    batch["region_gt"] = rs.rand(2, 16, 16, 1) > 0.5
    keys = mask_keys(batch)
    assert keys == MASK_KEYS + ("region_gt",)
    blob = pack_batch(batch)
    assert blob.shape == (2, 16 * 16 * 3 + 16 * 16 * 5 // 8)
    out = unpack_batch(jnp.asarray(blob), 16, 16, keys=keys)
    for k in keys:
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
    # without the key, behavior (and blob layout) is unchanged
    del batch["region_gt"]
    assert mask_keys(batch) == MASK_KEYS
    assert pack_batch(batch).shape == (2, 16 * 16 * 3 + 16 * 16 * 4 // 8)


def test_packable_rejects_float_batches():
    rs = np.random.RandomState(1)
    batch = _compact_batch(rs)
    float_batch = {k: (v.astype(np.float32) if isinstance(v, np.ndarray)
                       else v) for k, v in batch.items()}
    assert not packable(float_batch)
    assert not packable({"image": batch["image"]})      # masks missing


def test_train_step_packed_equals_float():
    """A train step fed the packed blob must match the step fed the
    expanded float batch bit-for-bit (same jitted math after the on-device
    unpack + decompress)."""
    from sketchedit_tpu.train.trainer import (
        TrainConfig, init_train_state, train_step)

    rs = np.random.RandomState(2)
    batch = _compact_batch(rs)
    cfg = TrainConfig()
    key = jax.random.PRNGKey(3)

    img = batch["image"].astype(np.float32) / 127.5 - 1.0
    float_batch = {"image": img, "gt": img}
    for k in MASK_KEYS:
        float_batch[k] = batch[k].astype(np.float32)

    state1 = init_train_state(jax.random.PRNGKey(0), cfg)
    _, m_float = jax.jit(lambda st, b, k: train_step(st, b, k, cfg))(
        state1, float_batch, key)

    state2 = init_train_state(jax.random.PRNGKey(0), cfg)
    blob = jnp.asarray(pack_batch(batch))
    _, m_packed = jax.jit(
        lambda st, b, k: train_step(st, unpack_batch(b, 16, 16), k, cfg))(
        state2, blob, key)

    for k in m_float:
        np.testing.assert_allclose(
            float(m_packed[k]), float(m_float[k]), rtol=1e-5, atol=1e-6,
            err_msg=k)
