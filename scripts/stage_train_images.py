"""Stage a real-image training directory from the bundled release assets.

The reference ships 8 real photographs (4 CelebAHQ faces + 4 Places
scenes, datasets/{face,general}_release/images/). Training-pipeline
proofs need a directory of distinct real files for the editimage loader
to decode (PIL decode + Canny + mask synthesis per item), so this tiles
the 8 originals into N augmented variants (random flip / crop / photometric
jitter) — real image statistics, no external downloads.

    python scripts/stage_train_images.py --out /tmp/train_imgs \
        --count 256 --size 256
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = (
    os.path.join(REPO, "datasets", "face_release", "images"),
    os.path.join(REPO, "datasets", "general_release", "images"),
)


def source_paths() -> list:
    """The bundled source photos, in the order stage() tiles them:
    variant staged_{i:05d}.jpg comes from source_paths()[i % len(...)]."""
    paths = []
    for d in SOURCES:
        if os.path.isdir(d):
            paths += [os.path.join(d, n) for n in sorted(os.listdir(d))
                      if n.lower().endswith((".png", ".jpg", ".jpeg"))]
    return paths


def stage(out_dir: str, count: int, size: int, seed: int = 0,
          quality: int = 95) -> list:
    rs = np.random.RandomState(seed)
    paths = source_paths()
    if not paths:
        raise SystemExit("no bundled release images found")
    os.makedirs(out_dir, exist_ok=True)
    originals = [np.asarray(Image.open(p).convert("RGB"), np.float32)
                 for p in paths]
    written = []
    for i in range(count):
        img = originals[i % len(originals)]
        h, w = img.shape[:2]
        # random crop of 75-100% of the frame, then resize to target
        frac = rs.uniform(0.75, 1.0)
        ch, cw = max(8, int(h * frac)), max(8, int(w * frac))
        y0 = rs.randint(0, h - ch + 1)
        x0 = rs.randint(0, w - cw + 1)
        crop = img[y0:y0 + ch, x0:x0 + cw]
        if rs.rand() < 0.5:
            crop = crop[:, ::-1]
        # photometric jitter: per-channel gain + brightness
        gain = rs.uniform(0.85, 1.15, size=(1, 1, 3))
        bias = rs.uniform(-12, 12)
        crop = np.clip(crop * gain + bias, 0, 255).astype(np.uint8)
        out = Image.fromarray(crop).resize((size, size), Image.BICUBIC)
        dst = os.path.join(out_dir, f"staged_{i:05d}.jpg")
        out.save(dst, quality=quality)
        written.append(dst)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--count", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    written = stage(a.out, a.count, a.size, a.seed)
    print(f"staged {len(written)} images ({a.size}x{a.size}) -> {a.out}")


if __name__ == "__main__":
    sys.exit(main())
