"""netD — spectral-norm PatchGAN discriminator (greenfield).

The reference release references but does not ship a discriminator
(SURVEY.md §2.9: `define_D` needs a models/networks/discriminator.py that
does not exist; only the `dis_conv` primitive and the call signature
`netD(fake_and_real, line, cc=...)` survive — editline2_model.py:386).
This implements the standard SN-PatchGAN of the DeepFill family ("Free-Form
Image Inpainting with Gated Convolution", Yu et al. 2019, arXiv:1806.03589)
with that exact call surface: input is `concat([image(3), line(1),
cc(3)])`, six 5x5/stride-2 leaky-relu convs with spectral normalization,
patch logits out.

Spectral norm is functional: one power-iteration step per call using `u`
vectors carried in the params tree (updated outside the gradient path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sketchedit_tpu.ops.gated_conv import leaky_conv2d, init_conv_params

# (name, cin, cout); all 5x5 stride 2 per dis_conv defaults (utils.py:53-70)
_SPECS = [
    ("dconv1", 7, 64),
    ("dconv2", 64, 128),
    ("dconv3", 128, 256),
    ("dconv4", 256, 256),
    ("dconv5", 256, 256),
    ("dconv6", 256, 256),
]


def init_params(key, *, ndf: int = 64, dtype=jnp.float32):
    del ndf  # fixed widths above; flag kept for config surface
    params = {}
    keys = jax.random.split(key, len(_SPECS))
    for k, (name, cin, cout) in zip(keys, _SPECS):
        p = init_conv_params(k, cin, cout, 5, init_type="xavier", dtype=dtype)
        p["u"] = jax.random.normal(
            jax.random.fold_in(k, 1), (cout,), dtype)
        params[name] = p
    return params


def _spectral_normalize(p):
    """One power-iteration step; returns (w / sigma, new_u)."""
    w = p["w"]
    cout = w.shape[-1]
    wm = w.reshape(-1, cout)                       # (fan_in, cout)
    u = p["u"]
    v = wm @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    # Detach BOTH power-iteration vectors (torch.nn.utils.spectral_norm
    # semantics): only the direct w term in sigma = v^T W u carries gradient.
    v = jax.lax.stop_gradient(v)
    u_new = wm.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    u_new = jax.lax.stop_gradient(u_new)
    sigma = v @ (wm @ u_new)
    return w / (sigma + 1e-12), u_new


def apply(params, image, line, cc, *, precision=None, update_sn: bool = False):
    """Patch logits for `concat([image, line, cc])`.

    Returns (logits, new_params) when update_sn else logits; new_params
    carries the updated power-iteration vectors.
    """
    x = jnp.concatenate([image, line, cc], axis=-1)
    new_params = {}
    for name, _cin, _cout in _SPECS:
        p = params[name]
        w_sn, u_new = _spectral_normalize(p)
        # slope 0.2 follows SN-PatchGAN (Yu et al. 2019) — a deliberate
        # departure from the reference dis_conv primitive's F.leaky_relu
        # default of 0.01 (utils.py:66), which was never exercised upstream.
        x = leaky_conv2d({"w": w_sn, "b": p["b"]}, x, stride=2,
                         negative_slope=0.2, precision=precision)
        new_params[name] = {"w": p["w"], "b": p["b"], "u": u_new}
    if update_sn:
        return x, new_params
    return x
