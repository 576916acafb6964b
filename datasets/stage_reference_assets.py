"""Stage the SketchEdit release fixtures (images/sketches/golden results)
into this repo's datasets/ and static/ layout.

The bundled assets of the reference release (datasets/face_release and
datasets/general_release: 4 input images + 4 sketch PNGs + 4 golden result
PNGs each, plus list.txt) are data fixtures, not code; we stage them from a
local checkout instead of committing binaries.

Usage:
    python datasets/stage_reference_assets.py [--source /path/to/sketchedit]
"""

import argparse
import os
import shutil

SETS = ("face_release", "general_release")
SUBDIRS = ("images", "edges", "results")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference",
                    help="path to a SketchEdit checkout with datasets/")
    ap.add_argument("--dest", default=os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--demo", action="store_true",
                    help="also populate static/images for the demo server")
    args = ap.parse_args()

    src_root = os.path.join(args.source, "datasets")
    if not os.path.isdir(src_root):
        raise SystemExit(f"no datasets/ under {args.source}")

    for name in SETS:
        src = os.path.join(src_root, name)
        dst = os.path.join(args.dest, name)
        if not os.path.isdir(src):
            print(f"skip {name}: not in source")
            continue
        for sub in SUBDIRS:
            s = os.path.join(src, sub)
            if not os.path.isdir(s):
                continue
            d = os.path.join(dst, sub)
            os.makedirs(d, exist_ok=True)
            for f in os.listdir(s):
                shutil.copy2(os.path.join(s, f), os.path.join(d, f))
        for f in ("list.txt",):
            if os.path.exists(os.path.join(src, f)):
                shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
        print(f"staged {name}")

    if args.demo:
        demo_dir = os.path.join(os.path.dirname(args.dest), "static",
                                "images")
        os.makedirs(demo_dir, exist_ok=True)
        names = []
        for name in SETS:
            s = os.path.join(src_root, name, "images")
            if not os.path.isdir(s):
                continue
            for f in sorted(os.listdir(s)):
                shutil.copy2(os.path.join(s, f), os.path.join(demo_dir, f))
                names.append(f)
        with open(os.path.join(demo_dir, "example.txt"), "w") as fh:
            fh.write("\n".join(names) + "\n")
        print(f"staged {len(names)} demo examples")


if __name__ == "__main__":
    main()
