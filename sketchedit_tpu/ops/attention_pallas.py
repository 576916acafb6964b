"""Fused contextual-attention kernels (Pallas, TPU) — forward AND backward.

Forward: the splitcam P1+P2 chain — similarity matmul, valid-ratio gating,
softmax(x10), and weighted patch recombination — in one kernel pipeline,
never materializing the (B, N, P) similarity tensor in HBM. This is the hot
quadratic op: at 512^2 the similarity tensor alone is B x 3969 x 3969
(63 MB/image fp32), all of which stays in VMEM tiles here.

Backward: flash-style dQ/dK/dV kernels reusing the forward's streaming
structure. The forward additionally emits the per-query logsumexp, so the
backward recomputes softmax probabilities tile-by-tile as exp(S - lse) and
never materializes (B, N, P) either — the softmax-backward row term
rowsum(dP*P) collapses to delta = rowsum(dO*O) (the standard
flash-attention identity), computed once in XLA.

Semantics match ops/attention.py exactly (same reference quirks: gated
similarities are *zeroed* before softmax so they contribute exp(0)=1 to the
denominator; padded key slots contribute nothing). Patch extraction and the
overlap-add fold stay outside — they're cheap static reshapes XLA fuses
well; the kernels own the quadratic part.

Grids run sequentially on TPU (innermost fastest), so fp32 scratch
accumulators carry state across the streamed axis of one program:
the forward and dQ kernels stream kv tiles, the dK/dV kernel streams
q tiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sketchedit_tpu.ops.attention import (
    extract_patches, fold_patches, patch_valid_ratio)
from sketchedit_tpu.ops.packed_tail import (
    depth_to_space2x, space_to_depth2x)

NEG_INF = -1e30


def _gate_mul(g):
    """Gate row -> the multiplier applied to similarities: {0,1} stay, the
    NEG_INF padding sentinel becomes 0 so 0*sim can't produce NaN (padded
    logits are forced to -inf separately)."""
    return jnp.where(g <= NEG_INF * 0.5, 0.0, g)


def _attn_kernel(q_ref, k_ref, v_ref, gate_ref, o_ref, lse_ref,
                 acc_ref, m_ref, l_ref, *, scale: float):
    """Grid (B, Nq, Nkv); one kv step of one (batch, q-tile) program.

    q_ref: (1, TQ, D); k_ref/v_ref: (1, TK, D); gate_ref: (1, 1, TK)
    with 1=keep, 0=gated, NEG_INF=padding. o_ref: (1, TQ, D);
    lse_ref: (1, TQ, 128) (per-query logsumexp, lane-broadcast).
    Scratch (persist across kv steps): acc (TQ, D), m/l (TQ, 128).
    """
    j = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0].astype(jnp.float32)

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, TK)
    # reference order: (sim * keep) * softmax_scale; padded keys -> -inf
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5,
                       NEG_INF, sim * g[None, :] * scale)

    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)

    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, 0:1] = m_new

    @pl.when(j == nkv - 1)
    def _():
        l_final = l_ref[:, 0:1]
        o_ref[0] = (acc_ref[:] / l_final).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, 0:1] + jnp.log(l_final), lse_ref.shape[1:]
        ).astype(lse_ref.dtype)


def _attn_shared_kernel(q_ref, v_ref, kscale_ref, gate_ref, o_ref, lse_ref,
                        acc_ref, m_ref, l_ref, *, scale: float):
    """Shared-tensor forward: grid (B, Nq, Nkv) like _attn_kernel, but the
    q stream and the kv stream are blocks of the SAME array, and K is
    derived in-register as v * kscale (the splitcam background L2
    normalization is a per-(batch, channel) scale — splitcam.py:39-40 —
    so K never needs to exist in HBM). That halves the quadratic HBM
    traffic: the inner kv loop streams ONE tensor instead of K and V.

    q_ref: (1, TQ, D) block i of V; v_ref: (1, TK, D) block j of V;
    kscale_ref: (1, 1, D) per-batch scale (inv-norm tiled over patch
    elements, channel-innermost); rest as _attn_kernel.
    """
    j = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    k = v * kscale_ref[0, 0].astype(jnp.float32)[None, :]
    g = gate_ref[0, 0].astype(jnp.float32)

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, TK)
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5,
                       NEG_INF, sim * g[None, :] * scale)

    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)

    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, 0:1] = m_new

    @pl.when(j == nkv - 1)
    def _():
        l_final = l_ref[:, 0:1]
        o_ref[0] = (acc_ref[:] / l_final).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, 0:1] + jnp.log(l_final), lse_ref.shape[1:]
        ).astype(lse_ref.dtype)


def _attn_kernel_dsplit(q_ref, k_ref, v_ref, gate_ref, o_ref, lse_ref,
                        acc_ref, m_ref, l_ref, *, scale: float):
    """D-split forward: grid (B, Nq, 2, Nkv) — one kv step of one
    (batch, q-tile, d-half) program. The PV accumulator and out block hold
    only this d-half (acc (TQ, D/2) instead of (TQ, D)), which is the
    scratch that capped q tiles at 512 rows; the similarity needs the full
    D contraction, so sim/softmax state are recomputed per half (2 passes
    over K, +50% matmul FLOPs) while V streams only the matching half.
    Net HBM traffic per q-tile pair vs two 512-row programs: 2K + V
    instead of 2K + 2V. The VERDICT r3 item-5 measurement kernel.

    q_ref: (1, TQ, D); k_ref: (1, TK, D); v_ref: (1, TK, D/2);
    o_ref: (1, TQ, D/2); lse written identically by both halves (benign).
    """
    j = pl.program_id(3)
    nkv = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0].astype(jnp.float32)

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, TK)
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5,
                       NEG_INF, sim * g[None, :] * scale)

    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)

    l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, 0:1] = m_new

    @pl.when(j == nkv - 1)
    def _():
        l_final = l_ref[:, 0:1]
        o_ref[0] = (acc_ref[:] / l_final).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_ref[:, 0:1] + jnp.log(l_final), lse_ref.shape[1:]
        ).astype(lse_ref.dtype)


def _attention_core_dsplit_raw(Q, K, V, keep, *,
                               softmax_scale: float = 10.0,
                               q_tile: int = 1024, kv_tile: int = 256,
                               return_lse: bool = False, out_dtype=None):
    """Forward with the PV accumulator split over the D axis (2 passes
    over K). Inference-only (no VJP) — gated by SKETCHEDIT_DSPLIT_ATTN
    for the 1024^2/2048^2 A/B; semantics identical to
    _attention_core_raw."""
    B, N, D = Q.shape
    P = K.shape[1]
    q_tile = min(q_tile, _round_up(N, 128))
    kv_tile = min(kv_tile, _round_up(P, 128))
    Np, Pp = _round_up(N, q_tile), _round_up(P, kv_tile)
    Dp = _round_up(D, 256)            # both halves must be lane-aligned
    Dh = Dp // 2
    Qp = jnp.pad(Q, ((0, 0), (0, Np - N), (0, Dp - D)))
    Kp = jnp.pad(K, ((0, 0), (0, Pp - P), (0, Dp - D)))
    Vp = jnp.pad(V, ((0, 0), (0, Pp - P), (0, Dp - D)))
    gate = jnp.pad(keep.astype(jnp.float32), ((0, 0), (0, Pp - P)),
                   constant_values=NEG_INF)[:, None, :]

    grid = (B, Np // q_tile, 2, Pp // kv_tile)
    kernel = functools.partial(_attn_kernel_dsplit, scale=softmax_scale)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, h, j: (b, i, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, h, j: (b, j, 0)),
            pl.BlockSpec((1, kv_tile, Dh), lambda b, i, h, j: (b, j, h)),
            pl.BlockSpec((1, 1, kv_tile), lambda b, i, h, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, q_tile, Dh), lambda b, i, h, j: (b, i, h)),
            pl.BlockSpec((1, q_tile, 128), lambda b, i, h, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, Dp), out_dtype or Q.dtype),
            jax.ShapeDtypeStruct((B, Np, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, Dh), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
        ],
    )(Qp, Kp, Vp, gate)
    if return_lse:
        return out[:, :N, :D], lse[:, :N, 0]
    return out[:, :N, :D]


def _dq_kernel(q_ref, k_ref, v_ref, gate_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc, *, scale: float):
    """Grid (B, Nq, Nkv): accumulate dQ for one q tile across kv tiles.

    dS = P * (dP - delta);  dQ += (dS * gate * scale) @ K
    with P = exp(S - lse), dP = dO @ V^T.
    """
    j = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0:1]
    delta = delta_ref[0, :, 0:1]

    gmul = _gate_mul(g)[None, :] * scale                 # (1, TK)
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5, NEG_INF, sim * gmul)
    p = jnp.exp(logits - lse)                            # (TQ, TK)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, TK)
    ds = p * (dp - delta) * gmul
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nkv - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkdv_kernel(k_ref, v_ref, gate_ref, q_ref, do_ref, lse_ref, delta_ref,
                 dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """Grid (B, Nkv, Nq): accumulate dK/dV for one kv tile across q tiles.

    dV += P^T @ dO;  dK += (dS * gate * scale)^T @ Q.
    """
    j = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0:1]
    delta = delta_ref[0, :, 0:1]

    gmul = _gate_mul(g)[None, :] * scale
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, TK)
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5, NEG_INF, sim * gmul)
    p = jnp.exp(logits - lse)

    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * gmul
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TK, D)

    @pl.when(j == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dv_kernel(k_ref, gate_ref, q_ref, do_ref, lse_ref,
               dv_ref, dv_acc, *, scale: float):
    """Grid (B, Nkv, Nq): dV += P^T @ dO for one kv tile across q tiles.
    Single f32 output -> 256-row kv blocks fit the scoped-VMEM budget
    (the fused dK+dV kernel's two outputs cap it at 128)."""
    j = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0:1]

    gmul = _gate_mul(g)[None, :] * scale
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5, NEG_INF, sim * gmul)
    p = jnp.exp(logits - lse)
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nq - 1)
    def _():
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dk_kernel(k_ref, v_ref, gate_ref, q_ref, do_ref, lse_ref, delta_ref,
               dk_ref, dk_acc, *, scale: float):
    """Grid (B, Nkv, Nq): dK += (dS * gate * scale)^T @ Q, 256-row kv
    blocks (single f32 output)."""
    j = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = gate_ref[0, 0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0:1]
    delta = delta_ref[0, :, 0:1]

    gmul = _gate_mul(g)[None, :] * scale
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = jnp.where(g[None, :] <= NEG_INF * 0.5, NEG_INF, sim * gmul)
    p = jnp.exp(logits - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * gmul
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_qkv(Q, K, V, keep, q_tile, kv_tile):
    B, N, D = Q.shape
    P = K.shape[1]
    Np, Pp, Dp = (_round_up(N, q_tile), _round_up(P, kv_tile),
                  _round_up(D, 128))
    Qp = jnp.pad(Q, ((0, 0), (0, Np - N), (0, Dp - D)))
    Kp = jnp.pad(K, ((0, 0), (0, Pp - P), (0, Dp - D)))
    Vp = jnp.pad(V, ((0, 0), (0, Pp - P), (0, Dp - D)))
    gate = jnp.pad(keep.astype(jnp.float32), ((0, 0), (0, Pp - P)),
                   constant_values=NEG_INF)[:, None, :]
    return Qp, Kp, Vp, gate, Np, Pp, Dp


def _fwd_tiles(dtype, out_dtype, N, P):
    # Tile defaults tuned on v5e. The kernel's HBM traffic is dominated by
    # K/V re-reads (once per q tile), so the q tile is as large as the
    # VMEM budget allows (incl. double buffering): bf16 streams afford
    # (512, 256), fp32 (128, 256). The differentiated path's f32 write-out
    # doubles the out block + accumulator footprint — 512-row tiles blow
    # the 16M scoped-VMEM limit at D=1536 (256^2 training), so halve them.
    wide = jnp.dtype(dtype).itemsize <= 2
    out_wide = jnp.dtype(out_dtype).itemsize <= 2
    q_tile = (512 if out_wide else 256) if wide else 128
    kv_tile = 256
    return min(q_tile, _round_up(N, 128)), min(kv_tile, _round_up(P, 128))


def _attention_core_raw(Q, K, V, keep, *, softmax_scale: float = 10.0,
                        q_tile: int | None = None,
                        kv_tile: int | None = None,
                        return_lse: bool = False,
                        out_dtype=None):
    """softmax(QK^T * keep * scale) @ V with the splitcam gating quirk.

    Q: (B, N, D); K, V: (B, P, D); keep: (B, P) in {0, 1}.
    Q/K/V stream in their input dtype (bf16 on the throughput path halves
    the DMA); the contraction and softmax state accumulate in fp32.
    Returns (B, N, D) in Q's dtype (+ the (B, N) f32 logsumexp when
    return_lse).
    """
    B, N, D = Q.shape
    P = K.shape[1]
    tq, tk = _fwd_tiles(Q.dtype, out_dtype or Q.dtype, N, P)
    q_tile = q_tile or tq
    kv_tile = kv_tile or tk
    Qp, Kp, Vp, gate, Np, Pp, Dp = _pad_qkv(Q, K, V, keep, q_tile, kv_tile)

    grid = (B, Np // q_tile, Pp // kv_tile)
    kernel = functools.partial(_attn_kernel, scale=softmax_scale)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, kv_tile), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, q_tile, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            # inference emits the streaming dtype: softmax state still
            # accumulates in f32 scratch; the write-out halves HBM traffic
            # on bf16 (and is what every caller casts to anyway). The
            # differentiated path overrides out_dtype=f32 — the backward's
            # delta = rowsum(dO*O) residual keeps full precision so
            # training numerics are unchanged.
            jax.ShapeDtypeStruct((B, Np, Dp), out_dtype or Q.dtype),
            jax.ShapeDtypeStruct((B, Np, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, Dp), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
        ],
    )(Qp, Kp, Vp, gate)
    if return_lse:
        return out[:, :N, :D], lse[:, :N, 0]
    return out[:, :N, :D]


def _attention_core_shared_raw(V, kscale, keep, *,
                               softmax_scale: float = 10.0,
                               q_tile: int | None = None,
                               kv_tile: int | None = None,
                               return_lse: bool = False,
                               out_dtype=None):
    """softmax((V @ (V*kscale)^T) * keep * scale) @ V — the released-config
    attention where foreground==background (editline_g.py:203-207 passes
    the same pm feature tensor as both), so Q IS V and K is V scaled by
    the per-(batch, channel) background inv-norm. One HBM tensor feeds
    both streams; the kernel derives K per tile. V: (B, N, D);
    kscale: (B, D); keep: (B, N)."""
    B, N, D = V.shape
    tq, tk = _fwd_tiles(V.dtype, out_dtype or V.dtype, N, N)
    q_tile = q_tile or tq
    kv_tile = kv_tile or tk
    # one padded array serves both streams: pad N so both tile sizes
    # divide it. lcm, not max: explicit non-dividing tiles (tuning use)
    # would otherwise floor-divide the grid and silently never write the
    # tail q rows. For the internal power-of-two tiles lcm == max.
    Npad = _round_up(N, math.lcm(q_tile, kv_tile))
    Dp = _round_up(D, 128)
    Vp = jnp.pad(V, ((0, 0), (0, Npad - N), (0, Dp - D)))
    ks = jnp.pad(kscale.astype(V.dtype),
                 ((0, 0), (0, Dp - D)))[:, None, :]
    gate = jnp.pad(keep.astype(jnp.float32), ((0, 0), (0, Npad - N)),
                   constant_values=NEG_INF)[:, None, :]

    grid = (B, Npad // q_tile, Npad // kv_tile)
    kernel = functools.partial(_attn_shared_kernel, scale=softmax_scale)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, Dp), lambda b, i, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, kv_tile), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, q_tile, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Npad, Dp), out_dtype or V.dtype),
            jax.ShapeDtypeStruct((B, Npad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, Dp), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
        ],
    )(Vp, Vp, ks, gate)
    if return_lse:
        return out[:, :N, :D], lse[:, :N, 0]
    return out[:, :N, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _core_shared_with_vjp(V, kscale, keep, softmax_scale):
    return _attention_core_shared_raw(V, kscale, keep,
                                      softmax_scale=softmax_scale)


def _core_shared_fwd(V, kscale, keep, softmax_scale):
    out, lse = _attention_core_shared_raw(V, kscale, keep,
                                          softmax_scale=softmax_scale,
                                          return_lse=True,
                                          out_dtype=jnp.float32)
    return out.astype(V.dtype), (V, kscale, keep, out, lse)


def _core_shared_bwd(softmax_scale, res, g):
    """Backward of the shared-tensor forward: materialize K = V * kscale
    once (exactly what the general path's XLA graph did in its forward),
    reuse the flash dQ/dK/dV kernels with Q := V, then fold the three
    gradients back onto the one primal:
      dV_total = dQ + dV + dK * kscale;   dkscale = sum_P dK * V.
    The sums run in f32; per-term values are bit-identical to the general
    path (same kernels, same residuals)."""
    V, kscale, keep, out, lse = res
    f32 = jnp.float32
    ks_row = kscale[:, None, :].astype(V.dtype)
    K = V * ks_row
    dQ, dK, dV = _attention_core_bwd_pallas(
        V, K, V, keep, out, lse, g, softmax_scale)
    dKf = dK.astype(f32)
    dV_total = (dQ.astype(f32) + dV.astype(f32)
                + dKf * kscale[:, None, :].astype(f32)).astype(V.dtype)
    dkscale = jnp.sum(dKf * V.astype(f32), axis=1).astype(kscale.dtype)
    return (dV_total, dkscale, jnp.zeros_like(keep))


_core_shared_with_vjp.defvjp(_core_shared_fwd, _core_shared_bwd)


def attention_core_pallas_shared(V, kscale, keep, *,
                                 softmax_scale: float = 10.0,
                                 q_tile: int | None = None,
                                 kv_tile: int | None = None):
    """Differentiable shared-tensor attention core (Q = V, K = V*kscale
    derived in-kernel). Halves the forward's quadratic HBM traffic vs
    attention_core_pallas — the kv inner loop streams one tensor, not
    two. Explicit tiles bypass the VJP (tuning/interpreter use)."""
    if q_tile is None and kv_tile is None:
        return _core_shared_with_vjp(V, kscale, keep, softmax_scale)
    return _attention_core_shared_raw(V, kscale, keep,
                                      softmax_scale=softmax_scale,
                                      q_tile=q_tile, kv_tile=kv_tile)


def _attention_core_bwd_pallas(Q, K, V, keep, out, lse, dO, softmax_scale,
                               q_tile: int = 256, kv_tile: int = 256,
                               dkv_tile: int | None = None):
    """Flash-style dQ/dK/dV. All quadratic terms stay in VMEM tiles.

    Bigger tiles + dO streamed in the input dtype lift the kernels from
    ~47% MFU (they were the two biggest ops of the bf16 train step at
    128/128 with an f32 dO stream). delta is computed OUTSIDE from the
    f32 out residual, so the only bf16 rounding added is on the
    dP = dO @ V^T operand — the same class as the inputs.

    The kernels emit gradients in the corresponding *input* dtype (the
    caller casts dK to K.dtype etc. immediately anyway; f32 accumulation
    happens in scratch either way, so the value is bit-identical). On the
    bf16 train path that halves the dK/dV output-block footprint, which
    is what lets the fused dK/dV kernel fit 256-row kv blocks under the
    16M scoped-VMEM limit — previously its TWO f32 outputs capped it at
    128 rows (60% MFU vs dQ's 76%). f32 inputs keep 128-row kv blocks.

    SKETCHEDIT_SPLIT_DKDV=1 routes through separate single-output dK and
    dV kernels (256-row kv blocks). MEASURED a wash on v5e against the
    128-row f32-out fused kernel (125.6 vs 125.2 img/s train @256^2
    b16): the split's better tiles are cancelled by recomputing sim/p in
    both kernels (5 matmuls vs 4). Kept as the record of the measurement.
    """
    B, N, D = Q.shape
    P = K.shape[1]
    if dkv_tile is None:
        dkv_tile = 256 if jnp.dtype(K.dtype).itemsize <= 2 else 128
    Qp, Kp, Vp, gate, Np, Pp, Dp = _pad_qkv(Q, K, V, keep, q_tile, kv_tile)
    dOp = jnp.pad(dO.astype(Q.dtype),
                  ((0, 0), (0, Np - N), (0, Dp - D)))
    # delta_i = sum_d dO_id * O_id — the flash softmax-backward row term
    delta = jnp.sum(dO.astype(jnp.float32) * out, axis=-1)          # (B, N)
    lse_p = jnp.pad(lse, ((0, 0), (0, Np - N)))[..., None]
    delta_p = jnp.pad(delta, ((0, 0), (0, Np - N)))[..., None]
    lse_p = jnp.broadcast_to(lse_p, (B, Np, 128))
    delta_p = jnp.broadcast_to(delta_p, (B, Np, 128))

    row_spec = pl.BlockSpec((1, q_tile, 128), lambda b, i, j: (b, i, 0))
    row_spec_j = pl.BlockSpec((1, q_tile, 128), lambda b, i, j: (b, j, 0))

    dQ = pl.pallas_call(
        functools.partial(_dq_kernel, scale=softmax_scale),
        grid=(B, Np // q_tile, Pp // kv_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, kv_tile), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), Q.dtype),
        scratch_shapes=[pltpu.VMEM((q_tile, Dp), jnp.float32)],
    )(Qp, Kp, Vp, gate, dOp, lse_p, delta_p)

    import os as _os
    if _os.environ.get("SKETCHEDIT_SPLIT_DKDV") == "1":
        kv_spec = pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, i, 0))
        q_stream = pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, j, 0))
        gate_spec = pl.BlockSpec((1, 1, kv_tile), lambda b, i, j: (b, 0, i))
        grid_kv = (B, Pp // kv_tile, Np // q_tile)
        dV = pl.pallas_call(
            functools.partial(_dv_kernel, scale=softmax_scale),
            grid=grid_kv,
            in_specs=[kv_spec, gate_spec, q_stream, q_stream, row_spec_j],
            out_specs=kv_spec,
            out_shape=jax.ShapeDtypeStruct((B, Pp, Dp), V.dtype),
            scratch_shapes=[pltpu.VMEM((kv_tile, Dp), jnp.float32)],
        )(Kp, gate, Qp, dOp, lse_p)
        dK = pl.pallas_call(
            functools.partial(_dk_kernel, scale=softmax_scale),
            grid=grid_kv,
            in_specs=[kv_spec, kv_spec, gate_spec, q_stream, q_stream,
                      row_spec_j, row_spec_j],
            out_specs=kv_spec,
            out_shape=jax.ShapeDtypeStruct((B, Pp, Dp), K.dtype),
            scratch_shapes=[pltpu.VMEM((kv_tile, Dp), jnp.float32)],
        )(Kp, Vp, gate, Qp, dOp, lse_p, delta_p)
        return (dQ[:, :N, :D], dK[:, :P, :D], dV[:, :P, :D])

    dK, dV = pl.pallas_call(
        functools.partial(_dkdv_kernel, scale=softmax_scale),
        grid=(B, Pp // dkv_tile, Np // q_tile),
        in_specs=[
            pl.BlockSpec((1, dkv_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, dkv_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, dkv_tile), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, j, 0)),
            row_spec_j,
            row_spec_j,
        ],
        out_specs=[
            pl.BlockSpec((1, dkv_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, dkv_tile, Dp), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Pp, Dp), K.dtype),
            jax.ShapeDtypeStruct((B, Pp, Dp), V.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((dkv_tile, Dp), jnp.float32),
                        pltpu.VMEM((dkv_tile, Dp), jnp.float32)],
    )(Kp, Vp, gate, Qp, dOp, lse_p, delta_p)

    return (dQ[:, :N, :D], dK[:, :P, :D], dV[:, :P, :D])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _core_with_vjp(Q, K, V, keep, softmax_scale):
    return _attention_core_raw(Q, K, V, keep, softmax_scale=softmax_scale)


def _core_fwd(Q, K, V, keep, softmax_scale):
    out, lse = _attention_core_raw(Q, K, V, keep,
                                   softmax_scale=softmax_scale,
                                   return_lse=True, out_dtype=jnp.float32)
    # primal aval must match the primal fn (Q.dtype); the f32 out is kept
    # as the residual so delta = rowsum(dO*O) stays full-precision.
    return out.astype(Q.dtype), (Q, K, V, keep, out, lse)


def _core_bwd(softmax_scale, res, g):
    Q, K, V, keep, out, lse = res
    dQ, dK, dV = _attention_core_bwd_pallas(
        Q, K, V, keep, out, lse, g, softmax_scale)
    # keep comes through stop_gradient at every call site (hole masks are
    # not differentiated); zero cotangent by construction.
    return (dQ.astype(Q.dtype), dK.astype(K.dtype), dV.astype(V.dtype),
            jnp.zeros_like(keep))


_core_with_vjp.defvjp(_core_fwd, _core_bwd)


def attention_core_pallas(Q, K, V, keep, *, softmax_scale: float = 10.0,
                          q_tile: int | None = None,
                          kv_tile: int | None = None):
    """Differentiable wrapper: Pallas forward AND flash-style Pallas
    backward (dQ/dK/dV kernels reusing the forward's streaming layout)."""
    if q_tile is None and kv_tile is None:
        return _core_with_vjp(Q, K, V, keep, softmax_scale)
    return _attention_core_raw(Q, K, V, keep, softmax_scale=softmax_scale,
                               q_tile=q_tile, kv_tile=kv_tile)


def contextual_attention_pallas(f, b, mask, *, patch_size: int = 4,
                                stride: int = 2, softmax_scale: float = 10.0,
                                th: float = 0.1):
    """Drop-in replacement for ops.attention.contextual_attention.

    Patch extraction runs on the space-to-depth grid: a 4x4/stride-2 patch
    of the feature map is exactly a 2x2/stride-1 window of 2x2-packed
    cells, so the unfold is 4 contiguous slices (instead of 16 strided
    ones) and the overlap-add fold is 4 shifted adds. The patch-element
    (D) ordering this induces is a fixed permutation of the row-major one;
    inner products over D are permutation-invariant and Q/K/V/fold all use
    the same ordering, so the attention output is unchanged (the XLA-path
    parity tests pin this)."""
    B, H, W, C = b.shape
    k, s = patch_size, stride
    if (k, s) != (4, 2) or H % 2 or W % 2:
        raise NotImplementedError("pallas path assumes patch 4, stride 2")
    in_dtype = f.dtype

    bf = b.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(bf * bf, axis=(1, 2), keepdims=True) + 1e-8)
    inv_norm = (1.0 / norm).astype(in_dtype)          # (B, 1, 1, C)

    vp = extract_patches(space_to_depth2x(b), 2, 1)
    nh, nw = vp.shape[1], vp.shape[2]
    P = nh * nw
    D = k * k * C
    V = vp.reshape(B, P, D)

    valid = 1.0 - mask.astype(jnp.float32)
    keep = (patch_valid_ratio(valid, k, s) > th).astype(jnp.float32)

    # K = patches of (b / ||b||) == V scaled per-channel: the norm is global
    # per (batch, channel), so it factors out of the patch extraction; c is
    # innermost in the packed D ordering too, so the same 16-fold tile works.
    import os as _os
    if f is b and _os.environ.get("SKETCHEDIT_SHARED_ATTN", "0") == "1":
        # the released call site (editline_g.py:203-207) passes the same
        # tensor as foreground and background: Q IS V and K is a per-
        # channel scaling of V, so the shared kernel derives K in-register
        # and streams ONE quadratic tensor from HBM instead of two.
        # SKETCHEDIT_SHARED_ATTN=0 restores the two-stream kernel (A/B).
        kscale = jnp.tile(inv_norm.reshape(B, 1, C),
                          (1, 1, k * k)).reshape(B, D)
        out = attention_core_pallas_shared(V, kscale, keep,
                                           softmax_scale=softmax_scale)
    else:
        K = V * jnp.tile(inv_norm.reshape(B, 1, C), (1, 1, k * k))
        # alias Q = V when fg is bg (the released call site) rather than
        # re-extracting the same patches and trusting XLA CSE to dedup —
        # a CSE miss across a remat boundary would materialize a second
        # (B, P, D) tensor (~100 MB/step at 1024^2)
        Q = V if f is b else \
            extract_patches(space_to_depth2x(f), 2, 1).reshape(B, P, D)
        if _os.environ.get("SKETCHEDIT_DSPLIT_ATTN", "0") == "1":
            # D-split PV accumulator (1024-row q tiles, 2 passes over K):
            # the VERDICT r3 item-5 A/B path; inference-only (no VJP)
            out = _attention_core_dsplit_raw(Q, K, V, keep,
                                             softmax_scale=softmax_scale)
        else:
            out = attention_core_pallas(Q, K, V, keep,
                                        softmax_scale=softmax_scale)
    # overlap-add in the streaming dtype (4-way sums; negligible rounding,
    # halves the fold's HBM traffic on the bf16 path)
    out = out.astype(in_dtype)
    folded = fold_patches(out.reshape(B, nh, nw, 2, 2, 4 * C),
                          (H // 2, W // 2), 1)
    return depth_to_space2x(folded, C)

