"""Space-to-depth-packed decoder tail.

The final decoder layers (the x2 upsample + two 3x3 convs that produce the
RGB/mask heads) run at full resolution with 12-48 channels — shapes that
leave the MXU's 128-wide lanes mostly idle (profiled at ~5 TF/s). This
module computes the SAME math on a 2x2-packed grid: half the spatial
resolution, 4x the channels, one cheap depth-to-space on the 1-3-channel
head output at the very end.

Exact algebra (verified to fp32 roundoff in tests):

* a 3x3 stride-1 conv commutes with 2x2 space-to-depth given a re-scattered
  (3,3,4Ci,4Co) kernel: output phase (a,b) at packed offset (dy',dx') reads
  input phase (py,px) where z=a+dy-1 decomposes as dy'=z//2, py=z%2 (and
  likewise for columns);
* nearest-x2-upsample + 3x3 conv emits packed output directly with a
  (3,3,Ci,4Co) kernel: the tap row is (a+dy-1)//2 with phases summing where
  they collide ([w0, w1+w2] / [w0+w1, w2] per output phase).

Packed channel order is phase-major: index = (py*2+px)*C + c, matching a
reshape-based space/depth transform.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def use_packing(batch: int) -> bool:
    """The single crossover decision for the space-to-depth packed layers.

    Measured on v5e-1 at 256^2: packing wins while the batch axis leaves
    MXU lanes idle (B < 64); at B >= 128 XLA's batch-in-lanes layouts
    already saturate and the packed path's 4x FLOPs lose. Measured in
    TRAINING graphs too: packing wins there as well (72.5 vs 51.1 img/s at
    b16/256^2) — the layout copies XLA inserts around the packed conv
    backwards (~15% of step time) are still cheaper than the unpacked
    narrow-channel tail backwards.

    Re-measured after gate-major packing removed the gating layout copies:
    the crossover moved from "loses at B>=64" to break-even at b64
    (629.5 packed vs 627.7 img/s) and still loses at b128 (996.5 vs
    1048.1), so B < 64 remains the right gate.

    Env override SKETCHEDIT_PACK=0/1 forces it off/on for experiments.
    """
    force = os.environ.get("SKETCHEDIT_PACK")
    if force is not None and force != "":
        return force != "0"
    return batch < 64


def use_mid_packing() -> bool:
    """Whether the 5-layer double-packed decoder tail (128^2-level segment
    included) replaces the 3-layer one. MEASURED DEAD END on v5e-1: loses
    at every shape tried (256^2: b1 139 vs 141, b8 450 vs 478, b32 488 vs
    522 img/s; 512^2 b8 101 vs 104.6) — the 128^2-level layers' 48-96
    effective channels already use lanes well enough that the packed
    path's 4x FLOPs don't pay. Kernel kept (exactness-tested) as the
    building block + the record of the measurement.
    Env SKETCHEDIT_PACK_MID=1 re-enables for experiments."""
    force = os.environ.get("SKETCHEDIT_PACK_MID")
    if force is not None and force != "":
        return force != "0"
    return False


def _build_maps(k: int = 3):
    """Constant scatter maps from a kxk kernel to packed kernels."""
    half = k // 2
    t_dec = np.zeros((3, 3, 4, k, k), np.float32)      # (dy',dx',phase,dy,dx)
    t_s2d = np.zeros((3, 3, 4, 4, k, k), np.float32)   # (dy',dx',pin,pout,dy,dx)
    for a in range(2):
        for b in range(2):
            pout = a * 2 + b
            for dy in range(k):
                zy = a + dy - half
                dly, py = zy // 2, zy % 2
                for dx in range(k):
                    zx = b + dx - half
                    dlx, px = zx // 2, zx % 2
                    if k == 3:
                        t_dec[dly + 1, dlx + 1, pout, dy, dx] += 1.0
                    t_s2d[dly + 1, dlx + 1, py * 2 + px, pout, dy, dx] += 1.0
    return t_dec, t_s2d


_T_DECONV, _T_S2D = _build_maps(3)
_, _T_S2D5 = _build_maps(5)

# stride-2 pad-1 3x3 conv consuming packed input: dy -> (kernel row, phase)
_T_STRIDE2 = np.zeros((2, 2, 4, 3, 3), np.float32)
_ROWMAP = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
for _dy in range(3):
    _kmy, _py = _ROWMAP[_dy]
    for _dx in range(3):
        _kmx, _px = _ROWMAP[_dx]
        _T_STRIDE2[_kmy, _kmx, _py * 2 + _px, _dy, _dx] += 1.0


def deconv_packed_weights(w):
    """(3,3,Ci,Co) -> (3,3,Ci,4Co): upsample-x2+conv emitting packed out."""
    ci, co = w.shape[2], w.shape[3]
    t = jnp.asarray(_T_DECONV, w.dtype)
    wp = jnp.einsum("YXPab,abio->YXiPo", t, w)
    return wp.reshape(3, 3, ci, 4 * co)


def s2d_conv_weights(w):
    """(k,k,Ci,Co), k in {3,5} -> (3,3,4Ci,4Co): the same stride-1 conv on
    the packed grid (a 5x5's taps still span only +-1 packed rows)."""
    k, _, ci, co = w.shape
    t = jnp.asarray(_T_S2D if k == 3 else _T_S2D5, w.dtype)
    wp = jnp.einsum("YXQPab,abio->YXQiPo", t, w)
    return wp.reshape(3, 3, 4 * ci, 4 * co)


def s2d_stride2_weights(w):
    """(3,3,Ci,Co) stride-2 pad-1 conv consuming packed input ->
    (2,2,4Ci,Co) stride-1 kernel with padding ((1,0),(1,0)); the output is
    the ordinary (unpacked) half-resolution feature map."""
    ci, co = w.shape[2], w.shape[3]
    t = jnp.asarray(_T_STRIDE2, w.dtype)
    wp = jnp.einsum("YXQab,abio->YXQio", t, w)
    return wp.reshape(2, 2, 4 * ci, co)


def _build_double_deconv_map():
    """Tap map for the pack2->pack2 deconv: nearest-x2-upsample + 3x3 conv
    taking a pack-2 image on grid G to the pack-2 OUTPUT image on grid 2G,
    as one lhs_dilation=2 conv with a 4x4 kernel.

    Derivation per axis: output 4x-res pixel q = 4I + 2*alpha + a
    (I = input-grid cell, alpha = output-grid sub-cell, a = output phase);
    the upsample+conv tap reads input 2x-res pixel u = (q + dy - 1) // 2 =
    2I + alpha + s with s = floor((a + dy - 1)/2); u's packed coordinates
    are cell I + floor((alpha+s)/2), phase (alpha+s) % 2; the lhs-dilated
    kernel index is k = 2*floor((alpha+s)/2) + 2 - alpha (always in 0..3).
    """
    t = np.zeros((4, 4, 4, 4, 3, 3), np.float32)  # (ky,kx,pin,pout,dy,dx)
    for ay in range(2):
        for dy in range(3):
            sy = (ay + dy - 1) // 2
            for aly in range(2):
                ty = aly + sy
                ky = 2 * (ty // 2) + 2 - aly
                piny = ty % 2
                for ax in range(2):
                    for dx in range(3):
                        sx = (ax + dx - 1) // 2
                        for alx in range(2):
                            tx = alx + sx
                            kx = 2 * (tx // 2) + 2 - alx
                            pinx = tx % 2
                            t[ky, kx, piny * 2 + pinx, ay * 2 + ax,
                              dy, dx] += 1.0
    return t


_T_DOUBLE_DECONV = _build_double_deconv_map()


def double_packed_deconv_weights(w):
    """(3,3,Ci,Co) -> (4,4,4Ci,4Co) for the pack2(grid G) -> pack2(grid 2G)
    upsample+conv (use with lhs_dilation=2, padding (2,2))."""
    ci, co = w.shape[2], w.shape[3]
    t = jnp.asarray(_T_DOUBLE_DECONV, w.dtype)
    wp = jnp.einsum("YXQPab,abio->YXQiPo", t, w)
    return wp.reshape(4, 4, 4 * ci, 4 * co)


def space_to_depth2x(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W // 2, 4 * C)


def depth_to_space2x(x, out_ch: int):
    B, h, w, _ = x.shape
    x = x.reshape(B, h, w, 2, 2, out_ch)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        B, 2 * h, 2 * w, out_ch)


def _conv(x, w, b, precision):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_DIMNUMS, precision=precision,
    ).astype(x.dtype)
    return y + jnp.tile(b, 4).astype(x.dtype)


_GM_PERMS: dict = {}


def _gate_major_perm(co: int):
    """Permutation taking phase-major packed channels (p, c) to gate-major:
    [all 4 phases' feature halves | all 4 phases' gate halves]."""
    if co not in _GM_PERMS:
        ch = co // 2
        p = np.arange(4)[:, None]
        feat = (p * co + np.arange(ch)[None, :]).reshape(-1)
        gate = (p * co + ch + np.arange(ch)[None, :]).reshape(-1)
        _GM_PERMS[co] = np.concatenate([feat, gate])
    return _GM_PERMS[co]


def _gate_major(wp, b):
    """Reorder a packed (..., 4*co) kernel and its per-phase bias so gating
    becomes a flat channel split (no (..., 4, co) reshape). The 5-D reshape
    forced XLA into a layout round-trip around every packed gated conv —
    measured ~10% of the whole b32/256^2 inference step; the flat split
    stays a fusable elementwise op. The gated output (feature block only)
    is phase-major again, so downstream packed convs are unaffected."""
    co = wp.shape[-1] // 4
    perm = _gate_major_perm(co)
    return wp[..., perm], jnp.tile(b, 4)[perm]


def _gate_flat(y, activation: str = "elu"):
    n = y.shape[-1] // 2
    act = jax.nn.elu if activation == "elu" else jax.nn.relu
    return act(y[..., :n]) * jax.nn.sigmoid(y[..., n:])


def _gated_conv_gm(x, wp, b, precision, *, lhs_dilation=None,
                   padding=((1, 1), (1, 1)), activation: str = "elu"):
    """Packed conv + gate with the gate-major kernel layout."""
    w, bfull = _gate_major(wp, b)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), padding, lhs_dilation=lhs_dilation,
        dimension_numbers=_DIMNUMS, precision=precision,
    ).astype(x.dtype)
    return _gate_flat(y + bfull.astype(x.dtype), activation)


def packed_encoder_front(p1, p2, x, *, precision=None):
    """conv1 (5x5 or 3x3, stride 1, gated) + conv2_downsample (3x3 stride 2,
    gated) computed on the packed half-resolution grid; input is the raw
    full-resolution tensor, output the ordinary half-res gated features.
    Exact rewrite of the encoder front (the 256^2-resolution layers whose
    3-5 input channels starve the MXU lanes)."""
    cout2 = p2["w"].shape[-1]
    xp = space_to_depth2x(x)
    h = _gated_conv_gm(xp, s2d_conv_weights(p1["w"]), p1["b"], precision)
    y = lax.conv_general_dilated(
        h, s2d_stride2_weights(p2["w"]).astype(h.dtype), (1, 1),
        [(1, 0), (1, 0)], dimension_numbers=_DIMNUMS, precision=precision,
    ).astype(h.dtype) + p2["b"].astype(h.dtype)
    a, g = y[..., :cout2 // 2], y[..., cout2 // 2:]
    return jax.nn.elu(a) * jax.nn.sigmoid(g)


def packed_decoder_tail5(p_up1, p_mid1, p_up2, p_mid2, p_head, x, *,
                         precision=None):
    """The last FIVE decoder layers (conv13_upsample, conv14,
    conv15_upsample, conv16, conv17 — both x2 upsamples included) computed
    entirely on packed grids: the 2x-resolution segment runs pack-2 on the
    input grid, the 4x-resolution segment pack-2 on the doubled grid via
    the composed double-packed deconv kernel. One depth-to-space on the
    1-3 channel head output at the very end. Exact math.

    x: the bottleneck-resolution features feeding the first upsample.
    """
    co_head = p_head["w"].shape[-1]

    # 2x-res segment on the input grid (pack-2)
    h = _gated_conv_gm(x, deconv_packed_weights(p_up1["w"]), p_up1["b"],
                       precision)
    h = _gated_conv_gm(h, s2d_conv_weights(p_mid1["w"]), p_mid1["b"],
                       precision)

    # pack2(grid) -> pack2(2*grid): the composed double-packed deconv
    y = _gated_conv_gm(h, double_packed_deconv_weights(p_up2["w"]),
                       p_up2["b"], precision, lhs_dilation=(2, 2),
                       padding=((2, 2), (2, 2)))

    # 4x-res segment on the doubled grid (pack-2)
    y = _gated_conv_gm(y, s2d_conv_weights(p_mid2["w"]), p_mid2["b"],
                       precision)
    y = _conv(y, s2d_conv_weights(p_head["w"]), p_head["b"], precision)
    return depth_to_space2x(y, co_head)


def packed_decoder_tail(p_up, p_mid, p_head, x, *, precision=None):
    """deconv(p_up) -> gated conv(p_mid) -> head conv(p_head), all on the
    packed half-resolution grid; returns the raw head output at full
    resolution (caller applies tanh/sigmoid).

    p_up/p_mid/p_head: {'w','b'} params of the reference conv15_upsample /
    conv16 / conv17-class layers (all 3x3).
    """
    cout_head = p_head["w"].shape[-1]

    h = _gated_conv_gm(x, deconv_packed_weights(p_up["w"]), p_up["b"],
                       precision)
    h = _gated_conv_gm(h, s2d_conv_weights(p_mid["w"]), p_mid["b"],
                       precision)
    h = _conv(h, s2d_conv_weights(p_head["w"]), p_head["b"], precision)
    return depth_to_space2x(h, cout_head)
