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

    Single-scale params (layer dicts) return one logits map; multiscale
    params ({'scale0': ..., 'scale1': ...}, init_multiscale_params) return a
    LIST of logits, coarsest last — the shape the reference's divide_pred
    list branch expects (editline2_model.py:397-406).

    Returns (logits, new_params) when update_sn else logits; new_params
    carries the updated power-iteration vectors.
    """
    if "scale0" in params:
        return _apply_multiscale(params, image, line, cc,
                                 precision=precision, update_sn=update_sn)
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


def trainable(params):
    """The gradient-carrying subtree: every layer's {w, b} without the
    power-iteration u vectors (works for single and multiscale params)."""
    if "w" in params:
        return {"w": params["w"], "b": params["b"]}
    return {k: trainable(v) for k, v in params.items()}


def with_u(trainable_tree, u_source):
    """Re-attach u vectors from u_source onto a trainable subtree."""
    if "w" in trainable_tree:
        return {**trainable_tree, "u": u_source["u"]}
    return {k: with_u(v, u_source[k]) for k, v in trainable_tree.items()}


# --- multiscale variant (SPADE-family MultiscaleDiscriminator shape) --------

def init_multiscale_params(key, *, num_d: int = 2, ndf: int = 64,
                           dtype=jnp.float32):
    """num_d independent SN-PatchGANs; scale i sees the input avg-pooled
    2^i times (SPADE MultiscaleDiscriminator semantics with the reference
    netD(img, line, cc) call surface)."""
    keys = jax.random.split(key, num_d)
    return {f"scale{i}": init_params(k, ndf=ndf, dtype=dtype)
            for i, k in enumerate(keys)}


def _downsample2(x):
    """SPADE's nn.AvgPool2d(3, 2, padding=1, count_include_pad=False),
    exactly: zero-pad, 3x3/stride-2 window sum, divide by the per-position
    VALID-element count. The count map is a pool over ones — shape-static,
    so XLA constant-folds it (pinned vs a torch oracle in
    tests/test_train.py)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 2, 2, 1), "VALID")
    ones = jnp.pad(jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype),
                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 2, 2, 1), "VALID")
    return out / cnt


def _apply_multiscale(params, image, line, cc, *, precision=None,
                      update_sn: bool = False):
    logits = []
    new_params = {}
    num_d = len(params)
    for i in range(num_d):
        name = f"scale{i}"
        out = apply(params[name], image, line, cc, precision=precision,
                    update_sn=update_sn)
        if update_sn:
            li, new_params[name] = out
        else:
            li = out
        logits.append(li)
        if i + 1 < num_d:
            image, line, cc = map(_downsample2, (image, line, cc))
    if update_sn:
        return logits, new_params
    return logits
