"""Pipeline runner: build the jitted edit function from parsed options.

This is the glue the reference spreads across models/__init__.py
(create_model) and EditLine2Model.initialize_networks — config -> params
(checkpoint or fresh init) -> one compiled device program, with optional
data-parallel sharding over all local devices.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from sketchedit_tpu.models import editline2
from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
from sketchedit_tpu.models.editline2 import EditLine2Config
from sketchedit_tpu.params import checkpoint as ckpt
from sketchedit_tpu.parallel.mesh import (
    BATCH_AXIS, data_parallel_mesh, shard_batch)


def respect_platform_env():
    """Honor an explicit JAX_PLATFORMS that excludes the tunneled TPU: the
    axon PJRT plugin prepends itself to jax_platforms even when the user
    asked for cpu, so re-assert the user's choice."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def enable_persistent_cache():
    """Persistent XLA compilation cache: first compile of the edit program
    is slow (20-40s on TPU, worse on CPU); subsequent process launches hit
    the disk cache. Override location via SKETCHEDIT_CACHE_DIR."""
    respect_platform_env()
    cache_dir = os.environ.get(
        "SKETCHEDIT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sketchedit_tpu",
                     "jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config names vary by version
        print(f"persistent compile cache unavailable: {e}")


def config_from_opt(opt) -> EditLine2Config:
    impl = getattr(opt, "attention_impl", "auto")
    attention_mesh = None
    if impl == "sharded":
        # patch-axis mesh over all local devices (SURVEY §5 long-context
        # analog). On a single device this degenerates to a 1-shard
        # shard_map — correct but pointless, so fall back to 'auto'.
        from sketchedit_tpu.parallel.sharded_attention import patch_mesh
        if len(jax.devices()) > 1:
            attention_mesh = patch_mesh()
        else:
            print("WARNING: --attention_impl sharded needs >1 device; "
                  "falling back to 'auto'")
            impl = "auto"
    return EditLine2Config(
        netg=DeepFillConfig(
            use_cam=getattr(opt, "use_cam", True),
            pool_type=getattr(opt, "pool_type", "max"),
            no_mask_cc=getattr(opt, "no_mask_cc", False),
            no_mask_coarse=getattr(opt, "no_mask_coarse", False),
            joint_train_inp=getattr(opt, "joint_train_inp", True),
            attention_impl=impl,
            attention_mesh=attention_mesh,
        ),
        precision=(None if getattr(opt, "precision", "highest") == "default"
                   else "highest"),
        compute_dtype=getattr(opt, "compute_dtype", "float32"),
    )


@dataclass
class EditPipeline:
    params: dict
    config: EditLine2Config
    edit_fn: callable
    edit_u8_fn: callable = None
    mesh: object | None = None

    def __call__(self, image_nhwc: np.ndarray, sketch_nhw1: np.ndarray):
        """Run one edit batch; returns numpy (composed, soft_mask).

        uint8 inputs take the fused uint8->uint8 device program (4x less
        host->device traffic); float inputs take the [-1,1] program.
        """
        image = jnp.asarray(image_nhwc)
        sketch = jnp.asarray(sketch_nhw1)
        n = image.shape[0]
        if self.mesh is not None:
            # Indivisible batches are padded up to the mesh size (repeating
            # the last sample) rather than silently running replicated:
            # the program stays sharded and the pad is sliced off below.
            d = self.mesh.shape[BATCH_AXIS]
            pad = (-n) % d
            if pad:
                image = jnp.concatenate(
                    [image, jnp.repeat(image[-1:], pad, axis=0)], axis=0)
                sketch = jnp.concatenate(
                    [sketch, jnp.repeat(sketch[-1:], pad, axis=0)], axis=0)
            image, sketch = shard_batch(self.mesh, image, sketch)
        fn = (self.edit_u8_fn if image.dtype == jnp.uint8 else self.edit_fn)
        composed, mask = fn(self.params, image, sketch)
        return np.asarray(composed)[:n], np.asarray(mask)[:n]


def build_pipeline(opt, *, require_checkpoint: bool = False) -> EditPipeline:
    enable_persistent_cache()
    config = config_from_opt(opt)
    dtype = jnp.dtype(config.compute_dtype)

    params, missing = ckpt.load_pipeline(opt, labels=("M", "G"), dtype=dtype)
    if missing:
        msg = (f"checkpoints missing for nets {missing} under "
               f"{opt.checkpoints_dir}/{opt.name} (epoch "
               f"{getattr(opt, 'which_epoch', 'latest')})")
        if require_checkpoint:
            raise FileNotFoundError(msg)
        print(f"WARNING: {msg}; using fresh init for those nets")
        fresh = editline2.init_params(
            jax.random.PRNGKey(0),
            init_type=getattr(opt, "init_type", "xavier"),
            gain=getattr(opt, "init_variance", 0.02), dtype=dtype)
        for label in missing:
            params[label] = fresh[label]

    n_dp = getattr(opt, "data_parallel", 0)
    mesh = None
    if config.netg.attention_mesh is not None:
        # sharded attention owns the devices (patch axis); combining it
        # with a batch-axis mesh would nest two meshes in one program
        n_dp = 1
    if n_dp == 0 and len(jax.devices()) > 1:
        n_dp = len(jax.devices())
    if n_dp > 1:
        mesh = data_parallel_mesh(n_dp)
        params = jax.device_put(
            params, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))

    edit_fn = jax.jit(partial(editline2.edit, config=config))
    edit_u8_fn = jax.jit(partial(editline2.edit_u8, config=config))
    return EditPipeline(params=params, config=config, edit_fn=edit_fn,
                        edit_u8_fn=edit_u8_fn, mesh=mesh)
