"""Golden regression snapshot: the edit() output for seeded params/inputs,
pinned against a stored fixture. Catches silent numeric drift without
needing the torch oracle (which pins *reference* parity separately).

Regenerate deliberately after an intended numeric change:
    python tests/test_golden.py --regen
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "edit_golden_16.npz")


def _compute():
    from sketchedit_tpu.models import editline2
    params = editline2.init_params(jax.random.PRNGKey(42))
    rs = np.random.RandomState(42)
    img = jnp.asarray(rs.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    sk = jnp.asarray((rs.rand(1, 16, 16, 1) > 0.85).astype(np.float32))
    composed, mask = editline2.edit(params, img, sk)
    return np.asarray(composed), np.asarray(mask)


def test_edit_matches_golden():
    assert os.path.exists(GOLDEN), "golden fixture missing; run --regen"
    composed, mask = _compute()
    with np.load(GOLDEN) as g:
        np.testing.assert_allclose(composed, g["composed"],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(mask, g["mask"], rtol=1e-3, atol=1e-4)


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        composed, mask = _compute()
        np.savez(GOLDEN, composed=composed, mask=mask)
        print(f"wrote {GOLDEN}")
