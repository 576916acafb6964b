"""Convert reference PyTorch checkpoints to sketchedit_tpu param pytrees.

The reference ships per-network state_dicts named `{epoch}_net_{M|G}.pth`
(util/util.py:190-225). Layout mapping:

* key `"<layer>.weight"` (OIHW) -> params[layer]["w"] (HWIO)
* key `"<layer>.bias"`          -> params[layer]["b"]
* a leading `"module."` prefix (DataParallel residue) is stripped, matching
  the reference loader (util/util.py:207-208, 221-222).

Works from either a live state_dict-like mapping of numpy/tensor arrays or a
.pth file (requires torch only in that case).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def state_dict_to_params(state_dict, dtype=jnp.float32):
    """Mapping of '<layer>.{weight,bias}' arrays -> nested params pytree."""
    params = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if "." not in key:
            continue
        layer, leaf = key.rsplit(".", 1)
        arr = _to_numpy(value)
        if leaf == "weight":
            if arr.ndim != 4:
                raise ValueError(f"{key}: expected OIHW conv weight, "
                                 f"got shape {arr.shape}")
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            params.setdefault(layer, {})["w"] = jnp.asarray(arr, dtype)
        elif leaf == "bias":
            params.setdefault(layer, {})["b"] = jnp.asarray(arr, dtype)
        else:
            raise ValueError(f"unexpected state_dict leaf: {key}")
    return params


def params_to_state_dict(params):
    """Inverse mapping, for exporting back to torch-compatible checkpoints."""
    out = {}
    for layer, leaves in params.items():
        out[f"{layer}.weight"] = np.asarray(leaves["w"]).transpose(3, 2, 0, 1)
        out[f"{layer}.bias"] = np.asarray(leaves["b"])
    return out


def load_torch_checkpoint(path, dtype=jnp.float32):
    """Load a reference .pth state_dict into a params pytree."""
    import torch  # local import: torch is only needed for .pth ingestion
    state = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_params(state, dtype)


def find_reference_checkpoint(checkpoints_dir, name, label, epoch="latest"):
    """Path of `{checkpoints_dir}/{name}/{epoch}_net_{label}.pth` (the
    reference naming convention, util/util.py:214-218)."""
    return os.path.join(checkpoints_dir, name, f"{epoch}_net_{label}.pth")
