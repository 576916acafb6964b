"""Device-mesh utilities: data-parallel (and attention patch-parallel)
sharding for the edit pipeline.

The reference has no distributed runtime at all (SURVEY.md §2.10) — its
only multi-device affordance is a --gpu_ids flag. The TPU-native design is
greenfield SPMD: put the batch axis on a 1-D `jax.sharding.Mesh`, annotate
inputs with NamedSharding, replicate params, and let XLA insert collectives
over ICI. The model is fully convolutional with per-sample attention, so
batch-DP needs no communication beyond the initial shard; psum only appears
in training (gradient reduction, train/trainer.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"


def data_parallel_mesh(n_devices: int | None = None,
                       devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays batch-sharded over the mesh (batch must divide)."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
