"""Self-contained serving artifacts via jax.export (StableHLO).

A deployment host should not need the model code, the checkpoint
converter, or the layer tables — just a serialized program and the bytes
in/bytes out contract. `export_edit_artifact` bakes the parameters into a
jitted `edit_u8` (uint8 image+sketch in, uint8 composite+mask out — the
same single-invocation program serving uses; models/editline2.py) and
serializes it with `jax.export`; `load_edit_artifact` deserializes and
returns a callable. The artifact pins (platform, size, batch, dtype,
attention impl) — one file per served configuration, mirroring the
one-compile-per-bucket discipline of server/executor.py.

Reference analog: the released `.pth` checkpoints + model repo
(download/download_model.sh) — the reference has no deployment story
beyond "clone the code"; this is the TPU-native equivalent of shipping a
compiled graph.
"""

from __future__ import annotations

import json
import os

import numpy as np


def export_edit_artifact(params, out_path: str, *, size: int = 256,
                         batch: int = 1, config=None,
                         platforms=None) -> dict:
    """Serialize edit_u8(params, ...) at a fixed (batch, size) to
    `out_path` (+ `.json` metadata sidecar). Returns the metadata."""
    import jax
    from jax import export as jexport
    from sketchedit_tpu.models import editline2

    if config is None:
        config = editline2.EditLine2Config()
    fn = jax.jit(lambda img, sk: editline2.edit_u8(params, img, sk,
                                                   config=config))
    img_spec = jax.ShapeDtypeStruct((batch, size, size, 3), np.uint8)
    sk_spec = jax.ShapeDtypeStruct((batch, size, size, 1), np.uint8)
    exported = jexport.export(fn, platforms=platforms)(img_spec, sk_spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    meta = {
        "size": size, "batch": batch,
        "platforms": list(exported.platforms),
        "compute_dtype": str(config.compute_dtype),
        "attention_impl": config.netg.attention_impl,
        "bytes": len(blob),
        "input": "uint8 image (B,S,S,3) + uint8 sketch (B,S,S,1)",
        "output": "uint8 composite (B,S,S,3) + uint8 mask (B,S,S,1)",
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ArtifactPipeline:
    """Executor-compatible pipeline backed by exported artifacts only —
    the serving host needs the .shlo files, not the model code.

    Each artifact is pinned to one batch size (one-compile-per-bucket,
    like server/executor.py's buckets); a request batch pads up to the
    smallest artifact batch that fits. `size` and `max_batch` mirror the
    metadata so serve_api can validate its flags against the artifact.
    """

    def __init__(self, paths):
        calls = [load_edit_artifact(p) for p in paths]
        self.by_batch = {c.meta["batch"]: c for c in calls}
        sizes = {c.meta["size"] for c in calls}
        if len(sizes) != 1:
            raise ValueError(f"artifacts disagree on size: {sizes}")
        self.size = sizes.pop()
        self.batches = sorted(self.by_batch)
        self.max_batch = self.batches[-1]

    def __call__(self, images, sketches):
        n = images.shape[0]
        b = next((s for s in self.batches if s >= n), None)
        if b is None:
            raise ValueError(f"batch {n} exceeds the largest artifact "
                             f"batch {self.max_batch}")
        if b > n:
            images = np.concatenate(
                [images, np.repeat(images[-1:], b - n, axis=0)])
            sketches = np.concatenate(
                [sketches, np.repeat(sketches[-1:], b - n, axis=0)])
        composed, mask = self.by_batch[b](images, sketches)
        return np.asarray(composed)[:n], np.asarray(mask)[:n]


def load_edit_artifact(path: str):
    """Deserialize an exported artifact -> callable
    (image_u8, sketch_u8) -> (composite_u8, mask_u8). The artifact runs
    on any host whose backend is in its platforms list — no model code,
    no checkpoint, no converter needed."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(image, sketch):
        return exported.call(image, sketch)

    call.exported = exported
    # batch/size are derivable from the program itself; the .json sidecar
    # only augments (a host that copied just the .shlo still serves)
    img_aval = exported.in_avals[0]
    call.meta = {"batch": int(img_aval.shape[0]),
                 "size": int(img_aval.shape[1]),
                 "platforms": list(exported.platforms)}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            call.meta.update(json.load(f))
    return call
