"""Checkpoint save/load.

Keeps the reference's directory layout and naming convention
(`{checkpoints_dir}/{name}/{epoch}_net_{label}` with labels M/G/D and the
'latest' epoch alias — util/util.py:190-225) while storing params natively
as .npz pytrees. Reference .pth checkpoints are ingested transparently via
the torch converter, so a user can drop the released SketchEdit weights
into `checkpoints/celeb/` and run unchanged scripts.

Orbax is used when available for sharded/async training checkpoints; the
.npz path has zero heavyweight deps and is the interchange format.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(params, prefix=""):
    flat = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def net_path(checkpoints_dir, name, label, epoch="latest", ext=".npz"):
    return os.path.join(checkpoints_dir, name, f"{epoch}_net_{label}{ext}")


def save_network(params, label, epoch, opt):
    """save_network analog: writes `{epoch}_net_{label}.npz` and refreshes
    the `latest` alias."""
    directory = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(directory, exist_ok=True)
    flat = _flatten(jax.device_get(params))
    np.savez(net_path(opt.checkpoints_dir, opt.name, label, epoch), **flat)
    if str(epoch) != "latest":
        np.savez(net_path(opt.checkpoints_dir, opt.name, label, "latest"),
                 **flat)


def load_network(label, opt, epoch=None, dtype=jnp.float32):
    """Load `{epoch}_net_{label}` — .npz natively, or a reference .pth via
    the torch converter. Returns None when neither exists."""
    epoch = epoch or getattr(opt, "which_epoch", "latest")
    npz = net_path(opt.checkpoints_dir, opt.name, label, epoch)
    if os.path.exists(npz):
        with np.load(npz) as data:
            return _unflatten({k: data[k] for k in data.files})
    pth = net_path(opt.checkpoints_dir, opt.name, label, epoch, ext=".pth")
    if os.path.exists(pth):
        from sketchedit_tpu.params.torch_convert import load_torch_checkpoint
        return load_torch_checkpoint(pth, dtype)
    return None


def load_network_path(path, dtype=jnp.float32):
    """Load params from an explicit path (.npz or .pth)."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            return _unflatten({k: data[k] for k in data.files})
    from sketchedit_tpu.params.torch_convert import load_torch_checkpoint
    return load_torch_checkpoint(path, dtype)


def save_train_state(state, opt, step_name="latest"):
    """Full training-state checkpoint (params + optimizer moments + step)
    via Orbax — resume-exact, unlike the per-network npz files which carry
    weights only. Written beside them as `train_state_{step_name}/`."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(
        opt.checkpoints_dir, opt.name, f"train_state_{step_name}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def _restructure(abstract, restored):
    """Rebuild `abstract`'s container types around Orbax's raw restore.

    A bare PyTreeCheckpointer.restore() returns dicts/lists only:
    NamedTuples (optax ScaleByAdamState, ...) come back as dicts keyed by
    field name, tuples as lists, and field-less NamedTuples (EmptyState)
    as None. Feeding that state to optimizer.update crashes
    ('dict' object has no attribute 'mu') — pinned by
    tests/test_train_cli.py's preempt-resume test."""
    if hasattr(abstract, "_fields"):              # NamedTuple
        missing = [f for f in abstract._fields if f not in restored]
        if missing:
            raise ValueError(
                f"checkpoint state mismatch: {type(abstract).__name__} "
                f"fields {missing} absent from the restored checkpoint "
                f"(saved with a different optimizer/trainer config?)")
        return type(abstract)(**{
            f: _restructure(getattr(abstract, f), restored[f])
            for f in abstract._fields})
    if isinstance(abstract, dict):
        if set(abstract) != set(restored):
            raise ValueError(
                "checkpoint state mismatch: expected keys "
                f"{sorted(abstract)} vs restored {sorted(restored)}")
        return {k: _restructure(v, restored[k])
                for k, v in abstract.items()}
    if isinstance(abstract, (list, tuple)):
        # zip would silently truncate (e.g. an optax chain changed between
        # save and resume), yielding a malformed state — fail loudly
        if len(abstract) != len(restored):
            raise ValueError(
                f"checkpoint state mismatch: expected {len(abstract)} "
                f"entries, restored {len(restored)} (optimizer chain "
                f"changed between save and resume?)")
        return type(abstract)(
            _restructure(a, r) for a, r in zip(abstract, restored))
    return jnp.asarray(restored, dtype=abstract.dtype)


def load_train_state(opt, abstract_state, step_name="latest"):
    """Restore a full training state; returns None when absent.
    `abstract_state` is a freshly-initialized state providing the tree
    structure/dtypes (restored leaves are cast to its dtypes)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(
        opt.checkpoints_dir, opt.name, f"train_state_{step_name}"))
    if not os.path.isdir(path):
        return None
    restored = ocp.PyTreeCheckpointer().restore(path)
    return _restructure(abstract_state, restored)


def save_pipeline(params, epoch, opt):
    """Save the M/G(/D) networks of an editline2 params tree."""
    for label in params:
        save_network(params[label], label, epoch, opt)


def load_pipeline(opt, epoch=None, labels=("M", "G"), dtype=jnp.float32):
    """Load the pipeline params; returns (params, missing_labels)."""
    params, missing = {}, []
    for label in labels:
        p = load_network(label, opt, epoch, dtype)
        if p is None:
            missing.append(label)
        else:
            params[label] = p
    return params, missing
