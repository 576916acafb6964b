"""Golden regression snapshots: the edit() output for seeded params/inputs,
pinned against stored fixtures. Catches silent numeric drift without
needing the torch oracle (which pins *reference* parity separately).

Two sizes: 16^2 (fast smoke) and 64^2 — at 64^2 the netG attention grid is
non-degenerate (16x16 features -> 7x7=49 patches), so the contextual
attention path is inside the drift check too.

Regenerate deliberately after an intended numeric change:
    python tests/test_golden.py --regen
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDENS = {16: os.path.join(_DIR, "edit_golden_16.npz"),
           64: os.path.join(_DIR, "edit_golden_64.npz")}


def _compute(size: int):
    from sketchedit_tpu.models import editline2
    params = editline2.init_params(jax.random.PRNGKey(42))
    rs = np.random.RandomState(42)
    img = jnp.asarray(
        rs.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
    sk = jnp.asarray((rs.rand(1, size, size, 1) > 0.85).astype(np.float32))
    composed, mask = editline2.edit(params, img, sk)
    return np.asarray(composed), np.asarray(mask)


def test_edit_matches_golden_16():
    _check(16)


def test_edit_matches_golden_64():
    _check(64)


def _check(size):
    path = GOLDENS[size]
    assert os.path.exists(path), f"golden fixture missing; run --regen"
    composed, mask = _compute(size)
    with np.load(path) as g:
        np.testing.assert_allclose(composed, g["composed"],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(mask, g["mask"], rtol=1e-3, atol=1e-4)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(_DIR, exist_ok=True)
        for size, path in GOLDENS.items():
            composed, mask = _compute(size)
            np.savez(path, composed=composed, mask=mask)
            print(f"wrote {path}")
