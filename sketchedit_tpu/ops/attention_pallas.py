"""Fused contextual-attention kernel (Pallas, TPU).

Computes the splitcam P1+P2 chain — similarity matmul, valid-ratio gating,
softmax(x10), and weighted patch recombination — in one kernel pipeline,
never materializing the (B, N, P) similarity tensor in HBM. This is the hot
quadratic op: at 512^2 the similarity tensor alone is B x 3969 x 3969
(63 MB/image fp32), all of which stays in VMEM tiles here.

Semantics match ops/attention.py exactly (same reference quirks: gated
similarities are *zeroed* before softmax so they contribute exp(0)=1 to the
denominator; padded key slots contribute nothing). Patch extraction and the
overlap-add fold stay outside — they're cheap static reshapes XLA fuses
well; the kernel owns the quadratic part.

Flash-attention-style streaming over a (B, Nq, Nkv) grid (TPU grids run
sequentially, innermost fastest, so fp32 scratch accumulators carry the
online softmax state across kv steps of one (batch, q-tile) program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sketchedit_tpu.ops.attention import (
    extract_patches, fold_patches, patch_valid_ratio)

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, gate_ref, o_ref,
                 acc_ref, m_ref, l_ref, *, scale: float):
    """Grid (B, Nq, Nkv); one kv step of one (batch, q-tile) program.

    q_ref: (1, TQ, D); k_ref/v_ref: (1, TK, D); gate_ref: (1, 1, TK)
    with 1=keep, 0=gated, NEG_INF=padding. o_ref: (1, TQ, D).
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
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _attention_core_dense(Q, K, V, keep, softmax_scale):
    """Dense reference of the core (differentiable; used for the VJP)."""
    sim = jnp.einsum("bnd,bpd->bnp", Q.astype(jnp.float32),
                     K.astype(jnp.float32))
    w = jax.nn.softmax(sim * keep[:, None, :].astype(jnp.float32)
                       * softmax_scale, axis=-1)
    return jnp.einsum("bnp,bpd->bnd", w, V.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _core_with_vjp(Q, K, V, keep, softmax_scale):
    return _attention_core_raw(Q, K, V, keep, softmax_scale=softmax_scale)


def _core_fwd(Q, K, V, keep, softmax_scale):
    return (_attention_core_raw(Q, K, V, keep, softmax_scale=softmax_scale),
            (Q, K, V, keep))


def _core_bwd(softmax_scale, res, g):
    """Backward chunked over query blocks: peak memory is B x CHUNK x P
    instead of B x N x P (63MB/image at 512^2), so high-resolution training
    never materializes the full attention matrix. Exact softmax backward:

        S = (QK^T) * keep * scale ; P = softmax(S) ; O = P V
        dV += P^T dO ; dP = dO V^T ; dS = P*(dP - rowsum(dP*P))
        dQ = (dS*keep*scale) K ; dK += (dS*keep*scale)^T Q
    """
    Q, K, V, keep = res
    B, N, D = Q.shape
    CHUNK = 512
    n_chunks = _round_up(N, CHUNK) // CHUNK
    pad = n_chunks * CHUNK - N
    Qp = jnp.pad(Q, ((0, 0), (0, pad), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    Qc = Qp.reshape(B, n_chunks, CHUNK, D).transpose(1, 0, 2, 3)
    gc = gp.reshape(B, n_chunks, CHUNK, D).transpose(1, 0, 2, 3)

    Kf = K.astype(jnp.float32)
    Vf = V.astype(jnp.float32)
    gate = keep.astype(jnp.float32)[:, None, :] * softmax_scale

    def chunk_grads(args):
        q, dO = args
        qf = q.astype(jnp.float32)
        dOf = dO.astype(jnp.float32)
        S = jnp.einsum("bnd,bpd->bnp", qf, Kf) * gate
        P = jax.nn.softmax(S, axis=-1)
        dV = jnp.einsum("bnp,bnd->bpd", P, dOf)
        dP = jnp.einsum("bnd,bpd->bnp", dOf, Vf)
        dS = P * (dP - jnp.sum(dP * P, axis=-1, keepdims=True))
        dSg = dS * gate
        dQ = jnp.einsum("bnp,bpd->bnd", dSg, Kf)
        dK = jnp.einsum("bnp,bnd->bpd", dSg, qf)
        return dQ, dK, dV

    dQc, dKc, dVc = jax.lax.map(chunk_grads, (Qc, gc))
    dQ = dQc.transpose(1, 0, 2, 3).reshape(B, n_chunks * CHUNK, D)[:, :N]
    dK = jnp.sum(dKc, axis=0)
    dV = jnp.sum(dVc, axis=0)
    return (dQ.astype(Q.dtype), dK.astype(K.dtype), dV.astype(V.dtype),
            jnp.zeros_like(keep))


_core_with_vjp.defvjp(_core_fwd, _core_bwd)


def attention_core_pallas(Q, K, V, keep, *, softmax_scale: float = 10.0,
                          q_tile: int | None = None,
                          kv_tile: int | None = None):
    """Differentiable wrapper: Pallas forward, dense-XLA backward."""
    if q_tile is None and kv_tile is None:
        return _core_with_vjp(Q, K, V, keep, softmax_scale)
    return _attention_core_raw(Q, K, V, keep, softmax_scale=softmax_scale,
                               q_tile=q_tile, kv_tile=kv_tile)


def _attention_core_raw(Q, K, V, keep, *, softmax_scale: float = 10.0,
                        q_tile: int | None = None,
                        kv_tile: int | None = None):
    """softmax(QK^T * keep * scale) @ V with the splitcam gating quirk.

    Q: (B, N, D); K, V: (B, P, D); keep: (B, P) in {0, 1}.
    Q/K/V stream in their input dtype (bf16 on the throughput path halves
    the DMA); the contraction and softmax state accumulate in fp32.
    Returns (B, N, D) float32.
    """
    B, N, D = Q.shape
    P = K.shape[1]
    # Tile defaults tuned on v5e: bf16 streams afford double-size kv tiles
    # within the ~16MB VMEM budget (incl. double buffering).
    wide = jnp.dtype(Q.dtype).itemsize <= 2
    q_tile = q_tile or (256 if wide else 128)
    kv_tile = kv_tile or (512 if wide else 256)
    q_tile = min(q_tile, _round_up(N, 128))
    kv_tile = min(kv_tile, _round_up(P, 128))
    Np, Pp, Dp = (_round_up(N, q_tile), _round_up(P, kv_tile),
                  _round_up(D, 128))

    Qp = jnp.pad(Q, ((0, 0), (0, Np - N), (0, Dp - D)))
    Kp = jnp.pad(K, ((0, 0), (0, Pp - P), (0, Dp - D)))
    Vp = jnp.pad(V, ((0, 0), (0, Pp - P), (0, Dp - D)))
    gate = jnp.pad(keep.astype(jnp.float32), ((0, 0), (0, Pp - P)),
                   constant_values=NEG_INF)[:, None, :]

    grid = (B, Np // q_tile, Pp // kv_tile)
    kernel = functools.partial(_attn_kernel, scale=softmax_scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, kv_tile, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, kv_tile), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q_tile, Dp), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.float32),
        ],
    )(Qp, Kp, Vp, gate)
    return out[:, :N, :D]


def contextual_attention_pallas(f, b, mask, *, patch_size: int = 4,
                                stride: int = 2, softmax_scale: float = 10.0,
                                th: float = 0.1):
    """Drop-in replacement for ops.attention.contextual_attention."""
    B, H, W, C = b.shape
    k, s = patch_size, stride
    in_dtype = f.dtype

    bf = b.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(bf * bf, axis=(1, 2), keepdims=True) + 1e-8)
    inv_norm = (1.0 / norm).astype(in_dtype)          # (B, 1, 1, C)

    vp = extract_patches(b, k, s)
    nh, nw = vp.shape[1], vp.shape[2]
    P = nh * nw
    D = k * k * C
    V = vp.reshape(B, P, D)
    # K = patches of (b / ||b||) == V scaled per-channel: the norm is global
    # per (batch, channel), so it factors out of the patch extraction —
    # tile it along the k*k patch-pixel axis instead of re-extracting.
    K = V * jnp.tile(inv_norm.reshape(B, 1, C), (1, 1, k * k))
    Q = V if f is b else extract_patches(f, k, s).reshape(B, P, D)

    valid = 1.0 - mask.astype(jnp.float32)
    keep = (patch_valid_ratio(valid, k, s) > th).astype(jnp.float32)

    out = attention_core_pallas(Q, K, V, keep, softmax_scale=softmax_scale)
    # overlap-add in the streaming dtype (4-way sums; negligible rounding,
    # halves the fold's HBM traffic on the bf16 path)
    out = out.astype(in_dtype)
    return fold_patches(out.reshape(B, nh, nw, k, k, C), (H, W), s)
