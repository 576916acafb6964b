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

from dataclasses import dataclass

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
    in_dtype = f.dtype            # compute in f32, emit the input dtype
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
    # match the pallas path: bf16 callers get bf16 back — otherwise the
    # whole stage-2 tail silently promotes to f32 under mixed precision
    out = out.astype(in_dtype)
    if return_weights:
        return out, w
    return out


# --- full splitcam configuration space --------------------------------------
#
# The released checkpoints pin one configuration (handled by the fast path
# above and the Pallas kernel); the reference constructors expose more
# (splitcam.py:17-34,110-122). splitcam_attention() implements the whole
# reachable space: nn_hard/hardmax (:8-15,106-107), is_fuse 2-pass diagonal
# smoothing (:73-87), the is_th=False replace-with-more-valid-patch branch
# (:91-103), per-patch norm_type=2 (:45-47), replicate pd padding (:41,68)
# with the P2 output crop (:161-163), and P2 mk=True hole-zeroed patch banks
# (:142-143).


@dataclass(frozen=True)
class SplitCAMConfig:
    """Constructor surface of ReduceContextAttentionP1/P2. Defaults are the
    released generator's instantiation (editline_g.py:35-42)."""
    bkg_patch_size: int = 4
    stride: int = 2          # query-conv stride (P1) and fold stride (P2)
    ufstride: int = 2        # patch-bank unfold stride
    softmax_scale: float = 10.0
    nn_hard: bool = False
    pd: int = 0              # replicate padding before unfold; P2 crops it
    fuse_k: int = 3
    is_fuse: bool = False
    th: float = 0.1
    norm_type: int = 1       # 1: global per-(B,C) L2; 2: per-(patch,C)
    is_th: bool = True       # False: replace-with-more-valid-patch gating
    mk: bool = False         # P2: zero hole pixels inside the patch bank

    @property
    def is_released(self) -> bool:
        return self == SplitCAMConfig()


def _pad_replicate(x, pd: int):
    if pd == 0:
        return x
    return jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode="edge")


def _fuse_diag(s, fuse_k: int):
    """One fuse pass: conv of the (P, N) plane with an identity (eye) kernel,
    zero padding 1 — i.e. a sum over flat-index diagonal offsets
    (splitcam.py:74-77). The reference hardcodes padding=1, so only
    fuse_k=3 is shape-preserving there; we keep that contract."""
    assert fuse_k == 3, "reference fuse uses padding=1; only fuse_k=3 works"
    sp = jnp.pad(s, ((0, 0), (1, 1), (1, 1)))
    return sp[:, :-2, :-2] + sp[:, 1:-1, 1:-1] + sp[:, 2:, 2:]


def _fuse(sim_pn, p_hw, n_hw, fuse_k: int):
    """Two-pass fuse smoothing (splitcam.py:73-87): pass 1 along the flat
    row-major diagonal; pass 2 after transposing both the patch grid and the
    position grid (swapping x/y roles)."""
    B, P, N = sim_pn.shape
    ph, pw = p_hw
    nh, nw = n_hw
    s = _fuse_diag(sim_pn, fuse_k)
    s = s.reshape(B, ph, pw, nh, nw).transpose(0, 2, 1, 4, 3).reshape(B, P, N)
    s = _fuse_diag(s, fuse_k)
    s = s.reshape(B, pw, ph, nw, nh).transpose(0, 2, 1, 4, 3).reshape(B, P, N)
    return s


def splitcam_attention(f, b, mask, config: SplitCAMConfig = SplitCAMConfig(),
                       *, precision=None, return_weights: bool = False,
                       return_recon: bool = False):
    """P1+P2 at any reference-reachable configuration.

    f, b: (B, H, W, C) foreground/background features; mask: (B, H, W, 1)
    hole mask (1 = hole), as the model passes it (editline_g.py:203-207).
    Returns out (B, H, W, C); optionally the (B, N, P) weights and/or the
    normalized hole reconstruction aux (splitcam.py:155-160).
    """
    cfg = config
    B, H, W, C = b.shape
    k, sq, sk, pd = cfg.bkg_patch_size, cfg.stride, cfg.ufstride, cfg.pd
    in_dtype = f.dtype
    f = f.astype(jnp.float32)
    b = b.astype(jnp.float32)
    valid = 1.0 - mask.astype(jnp.float32)

    # P1 patch bank: norm first (over the UNPADDED map for norm_type 1,
    # splitcam.py:39-41), then replicate-pad, then unfold.
    if cfg.norm_type == 1:
        norm = jnp.sqrt(jnp.sum(b * b, axis=(1, 2), keepdims=True) + 1e-8)
        bn = b / norm
    else:
        bn = b
    kp = extract_patches(_pad_replicate(bn, pd), k, sk)
    p_hw = (kp.shape[1], kp.shape[2])
    P = p_hw[0] * p_hw[1]
    D = k * k * C
    K = kp.reshape(B, P, D)
    if cfg.norm_type == 2:
        # per-(patch, channel) L2 over the kxk pixels (splitcam.py:45-47)
        kp2 = K.reshape(B, P, k * k, C)
        kn = jnp.sqrt(jnp.sum(kp2 * kp2, axis=2, keepdims=True) + 1e-8)
        K = (kp2 / kn).reshape(B, P, D)

    mmk = patch_valid_ratio(_pad_replicate(valid, pd), k, sk)      # (B, P)

    qp = extract_patches(_pad_replicate(f, pd), k, sq)
    n_hw = (qp.shape[1], qp.shape[2])
    N = n_hw[0] * n_hw[1]
    Q = qp.reshape(B, N, D)

    sim = jnp.einsum("bnd,bpd->bnp", Q, K, precision=precision)

    if cfg.is_fuse:
        sim = _fuse(sim.transpose(0, 2, 1), p_hw, n_hw,
                    cfg.fuse_k).transpose(0, 2, 1)

    if cfg.is_th:
        gate = (mmk > cfg.th).astype(jnp.float32)[:, None, :]      # (B,1,P)
    else:
        # replace-with-more-valid-patch (splitcam.py:91-103): per-query
        # valid ratio mmp; keep patch p for query n iff (it is strictly more
        # valid AND the query patch is itself partially valid) OR the patch
        # is fully valid.
        mmp = patch_valid_ratio(_pad_replicate(valid, pd), k, sq)  # (B, N)
        more_valid = mmk[:, None, :] > mmp[:, :, None]             # (B,N,P)
        partial = (mmp > cfg.th)[:, :, None]
        full = (mmk == 1.0)[:, None, :]
        gate = ((more_valid & partial) | full).astype(jnp.float32)

    w = jax.nn.softmax(sim * gate * cfg.softmax_scale, axis=-1)
    if cfg.nn_hard:
        w = jax.lax.stop_gradient(
            jax.nn.one_hot(jnp.argmax(w, axis=-1), P, dtype=w.dtype))

    # P2: original-b patch bank, optionally hole-zeroed (splitcam.py:142-143)
    V = extract_patches(_pad_replicate(b, pd), k, sk).reshape(B, P, D)
    mk_patches = extract_patches(
        _pad_replicate(mask.astype(jnp.float32), pd), k, sk
    ).reshape(B, P, k * k)
    if cfg.mk:
        V = (V.reshape(B, P, k * k, C)
             * (1.0 - mk_patches)[..., None]).reshape(B, P, D)

    outp = jnp.einsum("bnp,bpd->bnd", w, V, precision=precision)
    Hp, Wp = H + 2 * pd, W + 2 * pd
    out = fold_patches(outp.reshape(B, *n_hw, k, k, C), (Hp, Wp), sq)
    if pd > 0:
        out = out[:, pd:-pd, pd:-pd]

    results = [out.astype(in_dtype)]
    if return_weights:
        results.append(w)
    if return_recon:
        reconp = jnp.einsum("bnp,bpk->bnk", w, mk_patches)
        recon = fold_patches(
            reconp.reshape(B, *n_hw, k, k, 1), (Hp, Wp), sq)
        ones = jnp.ones((1, *n_hw, k, k, 1), jnp.float32)
        overlap = fold_patches(ones, (Hp, Wp), sq)
        recon = recon / overlap
        if pd > 0:
            recon = recon[:, pd:-pd, pd:-pd]
        results.append(recon)
    return results[0] if len(results) == 1 else tuple(results)


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
