"""Export a self-contained serving artifact (StableHLO via jax.export).

Loads the checkpoint with the standard options surface (same flags as
test.py / serve_api.py), bakes the weights into a jitted uint8->uint8
edit program at a fixed (batch, size), and writes <out> + <out>.json.
A deployment host loads it with
`sketchedit_tpu.server.artifact.load_edit_artifact` — no model code,
no checkpoint files, no converter.

Example:
  python scripts/export_serving_artifact.py --name celeb --use_cam \\
      --pool_type max --joint_train_inp --dataset_mode base \\
      --compute_dtype bfloat16 --precision default \\
      --export_size 256 --export_batch 32 --export_out celeb_256_b32.shlo
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sketchedit_tpu.options.test_options import TestOptions
    from sketchedit_tpu.runner import (
        build_pipeline, enable_persistent_cache, respect_platform_env)
    from sketchedit_tpu.server.artifact import export_edit_artifact

    parser_holder = TestOptions()
    # ride the standard two-phase parser: register our flags on top
    init = parser_holder.initialize

    def initialize(parser):
        parser = init(parser)
        parser.add_argument("--export_size", type=int, default=256)
        parser.add_argument("--export_batch", type=str, default="1",
                            help="batch size, or a comma list ('1,8,32') "
                                 "to emit one artifact per serving bucket "
                                 "(suffix _b{N} before the extension)")
        parser.add_argument("--export_out", type=str,
                            default="edit_artifact.shlo")
        parser.add_argument("--export_platforms", type=str, default="",
                            help="comma list (e.g. 'tpu,cpu'); empty = "
                                 "the current default backend")
        return parser

    parser_holder.initialize = initialize
    respect_platform_env()
    enable_persistent_cache()
    opt = parser_holder.parse()

    pipe = build_pipeline(opt)
    platforms = ([p for p in opt.export_platforms.split(",") if p]
                 or None)
    batches = [int(b) for b in str(opt.export_batch).split(",") if b]
    if not batches:
        # an unset shell variable ('--export_batch ""') must not exit 0
        # with nothing exported — the deploy pipeline would proceed
        raise SystemExit(
            f"--export_batch {opt.export_batch!r} names no batch sizes")
    for b in batches:
        if len(batches) == 1:
            out = opt.export_out
        else:
            root, ext = os.path.splitext(opt.export_out)
            out = f"{root}_b{b}{ext}"
        meta = export_edit_artifact(
            pipe.params, out, size=opt.export_size,
            batch=b, config=pipe.config, platforms=platforms)
        print(f"exported {out}: {meta}")


if __name__ == "__main__":
    main()
