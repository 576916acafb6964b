"""Patch-axis-sharded contextual attention for very high resolutions.

SURVEY.md §5: the scaling-sensitive analog of sequence parallelism here is
the contextual-attention patch count — P grows O(N^2) with resolution
(961 patches at 256^2, 3969 at 512^2, ~16k at 1024^2). This shards the
*query-patch* axis over a device mesh with `shard_map`: every device holds
the full K/V patch bank (they are only P x D, a few MB) and computes
softmax + reconstruction for its slice of query positions — fully local,
no collectives on the hot path; XLA inserts the all-gather when the caller
needs the folded output replicated.

For batch-parallel serving, ordinary DP over the batch axis (parallel/
mesh.py) is preferred; this kernel is for single-image giant-resolution
editing where the batch axis cannot be split.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sketchedit_tpu.ops.attention import (
    extract_patches, fold_patches, patch_valid_ratio)

PATCH_AXIS = "patch"


def _local_attend(Q_local, K, V, keep, softmax_scale, precision, kernel):
    if kernel == "pallas":
        # stream the local shard through the fused Pallas kernel: the
        # (n_local, P) similarity tile never exists in HBM on any chip —
        # the composition that makes 2048^2-class editing feasible
        # (P ~ 65k patches; the dense per-shard sim alone would be
        # n_local x P x 4B per chip)
        from sketchedit_tpu.ops.attention_pallas import (
            attention_core_pallas)
        return attention_core_pallas(Q_local, K, V, keep,
                                     softmax_scale=softmax_scale)
    sim = jnp.einsum("bnd,bpd->bnp", Q_local, K, precision=precision)
    logits = sim * keep[:, None, :] * softmax_scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnp,bpd->bnd", w, V, precision=precision)


def contextual_attention_sharded(f, b, mask, mesh: Mesh, *,
                                 patch_size: int = 4, stride: int = 2,
                                 softmax_scale: float = 10.0,
                                 th: float = 0.1, precision=None,
                                 kernel: str = "auto"):
    """Same semantics as ops.attention.contextual_attention, query-patch
    axis sharded over `mesh`'s '{PATCH_AXIS}' axis. P must divide evenly
    by the axis size (pad the image so the patch grid does).

    kernel: 'dense' computes the per-shard attention as einsums (the
    local similarity block materializes); 'pallas' streams each shard
    through the fused kernel (ops/attention_pallas.py) so the similarity
    never exists in HBM on ANY chip; 'auto' picks pallas on TPU."""
    B, H, W, C = b.shape
    k, s = patch_size, stride
    in_dtype = f.dtype
    bf = b.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(bf * bf, axis=(1, 2), keepdims=True) + 1e-8)

    vp = extract_patches(bf, k, s)
    nh, nw = vp.shape[1], vp.shape[2]
    Pn = nh * nw
    D = k * k * C
    V = vp.reshape(B, Pn, D)
    K = V * jnp.tile((1.0 / norm).reshape(B, 1, C), (1, 1, k * k))
    Q = (V if f is b
         else extract_patches(f.astype(jnp.float32), k, s).reshape(B, Pn, D))

    valid = 1.0 - mask.astype(jnp.float32)
    keep = (patch_valid_ratio(valid, k, s) > th).astype(jnp.float32)

    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "dense"
    n_shards = mesh.shape[PATCH_AXIS]
    # pad the QUERY axis to the mesh size (padded rows attend to the real
    # K/V bank and are sliced off before the fold — always exact)
    pad = (-Pn) % n_shards
    Qp = jnp.pad(Q, ((0, 0), (0, pad), (0, 0)))

    attend = shard_map(
        partial(_local_attend, softmax_scale=softmax_scale,
                precision=precision, kernel=kernel),
        mesh=mesh,
        in_specs=(P(None, PATCH_AXIS, None), P(), P(), P()),
        out_specs=P(None, PATCH_AXIS, None),
        # pallas_call can't annotate varying-across-mesh on its outputs;
        # the body is fully local either way (no collectives), so VMA
        # checking buys nothing here
        check_vma=False,
    )
    out = attend(Qp, K, V, keep)[:, :Pn]
    folded = fold_patches(out.reshape(B, nh, nw, k, k, C), (H, W), s)
    return folded.astype(in_dtype)


def patch_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (PATCH_AXIS,))
