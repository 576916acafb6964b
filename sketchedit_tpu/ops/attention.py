"""Contextual attention ("splitcam") as two batched matmuls, NHWC.

Replicates the reference's two-phase patch attention
(/root/reference/models/networks/splitcam.py) at the configuration the
released generator uses (editline_g.py:35-42): patch 4x4, stride 2,
ufstride 2, pd 0, norm_type 1, is_th with th=0.1, softmax_scale 10,
nn_hard False, is_fuse False, mk False.

Key semantic quirks reproduced exactly:

* P1 normalizes the *background* features by their global per-(batch,channel)
  spatial L2 norm — not per patch (splitcam.py:39-40).
* Background patches whose valid-pixel ratio is <= 0.1 are gated by
  *multiplying their similarity by zero before softmax* (splitcam.py:89-90,
  104-105), so gated patches still contribute exp(0)=1 to the softmax
  denominator. This is NOT equivalent to -inf masking and we keep it.
* P2's overlap-add reconstruction is NOT normalized by the overlap count
  (splitcam.py:152-160 divides only the auxiliary mask_recon).

TPU mapping: patch extraction/folding are static strided slices; the
similarity and reconstruction phases are (B, N, D) x (B, D, P) batched
matmuls that XLA tiles onto the MXU. A fused Pallas kernel for the
sim->gate->softmax->recombine chain lives in attention_pallas.py; this module
is the reference/XLA path and the fallback on non-TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches(x, k: int, s: int):
    """(B,H,W,C) -> (B, nh, nw, k, k, C) patches at stride s, VALID."""
    B, H, W, C = x.shape
    nh = (H - k) // s + 1
    nw = (W - k) // s + 1
    rows = jnp.stack(
        [x[:, dy:dy + (nh - 1) * s + 1:s] for dy in range(k)], axis=2)
    # rows: (B, nh, k, W, C)
    patches = jnp.stack(
        [rows[:, :, :, dx:dx + (nw - 1) * s + 1:s] for dx in range(k)], axis=4)
    # patches: (B, nh, k, nw, k, C) -> (B, nh, nw, k, k, C)
    return jnp.transpose(patches, (0, 1, 3, 2, 4, 5))


def fold_patches(patches, out_hw, s: int):
    """Overlap-ADD patches back to an image; inverse of extract_patches.

    patches: (B, nh, nw, k, k, C). Overlapping contributions sum — the
    un-normalized fold the reference's batch_transposeconv2d performs.
    """
    B, nh, nw, k, _, C = patches.shape
    H, W = out_hw
    out = jnp.zeros((B, H, W, C), patches.dtype)
    for dy in range(k):
        for dx in range(k):
            out = out.at[:, dy:dy + (nh - 1) * s + 1:s,
                         dx:dx + (nw - 1) * s + 1:s].add(patches[:, :, :, dy, dx])
    return out


def patch_valid_ratio(valid, k: int, s: int):
    """Mean of a (B,H,W,1) validity map over each kxk patch -> (B, P).

    Implemented as a strided average pool (identical to the unfold+mean the
    reference does, far cheaper than materializing mask patches)."""
    v = valid.astype(jnp.float32)
    summed = jax.lax.reduce_window(
        v, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), "VALID")
    B = v.shape[0]
    return summed.reshape(B, -1) / float(k * k)


def contextual_attention(f, b, mask, *, patch_size: int = 4, stride: int = 2,
                         softmax_scale: float = 10.0, th: float = 0.1,
                         return_weights: bool = False, precision=None):
    """Patch attention: f attends over patches of b, gated by hole mask.

    Args:
      f: foreground features (B, H, W, C) — the query stream.
      b: background features (B, H, W, C) — patch source (f is b here).
      mask: hole mask (B, h, w, 1) at feature resolution; 1 = hole.
      th: background patches with valid ratio <= th are gated out.

    Returns reconstructed features (B, H, W, C); optionally the attention
    weights (B, N, P) for tests.
    """
    B, H, W, C = b.shape
    k, s = patch_size, stride
    f = f.astype(jnp.float32)
    b = b.astype(jnp.float32)

    # P1: global per-(batch, channel) spatial L2 normalization of b.
    norm = jnp.sqrt(jnp.sum(b * b, axis=(1, 2), keepdims=True) + 1e-8)
    bn = b / norm

    kp = extract_patches(bn, k, s)
    nh, nw = kp.shape[1], kp.shape[2]
    P = nh * nw
    D = k * k * C
    K = kp.reshape(B, P, D)
    V = extract_patches(b, k, s).reshape(B, P, D)

    valid = 1.0 - mask.astype(jnp.float32)
    keep = (patch_valid_ratio(valid, k, s) > th).astype(jnp.float32)  # (B, P)

    Q = extract_patches(f, k, s).reshape(B, P, D)   # fg positions == P here
    sim = jnp.einsum("bnd,bpd->bnp", Q, K, precision=precision)
    logits = sim * keep[:, None, :] * softmax_scale
    w = jax.nn.softmax(logits, axis=-1)

    outp = jnp.einsum("bnp,bpd->bnd", w, V, precision=precision)
    out = fold_patches(outp.reshape(B, nh, nw, k, k, C), (H, W), s)
    if return_weights:
        return out, w
    return out


def attention_mask_recon(weights, mask, out_hw, *, patch_size: int = 4,
                         stride: int = 2):
    """Auxiliary hole-mask reconstruction (splitcam.py:155-160): transposed
    conv of the weights with mask patches, normalized by the overlap count.
    Unused on the inference hot path; kept for train-time parity."""
    B, N, P = weights.shape
    k, s = patch_size, stride
    mk = extract_patches(mask.astype(jnp.float32), k, s).reshape(B, P, -1)
    outp = jnp.einsum("bnp,bpd->bnd", weights, mk)
    nh = nw = int(round(N ** 0.5))
    recon = fold_patches(outp.reshape(B, nh, nw, k, k, 1), out_hw, s)
    ones = jnp.ones((1, nh, nw, k, k, 1), jnp.float32)
    overlap = fold_patches(ones, out_hw, s)
    return recon / overlap
