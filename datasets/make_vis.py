"""Overlay sketches on images for figures (reference
datasets/general_release/make_vis.py equivalent).

Reads paired images and sketch PNGs, draws the sketch strokes in blue over
the image, writes the visualizations.

Usage:
    python datasets/make_vis.py --image_dir general_release/images \
        --edge_dir general_release/edges --output_dir general_release/vis
"""

import argparse
import os

import numpy as np
from PIL import Image

STROKE_RGB = (0, 0, 255)


def overlay(image: np.ndarray, sketch: np.ndarray) -> np.ndarray:
    mask = sketch > 0
    out = image.copy()
    out[mask] = STROKE_RGB
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--edge_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    args = ap.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    for name in sorted(os.listdir(args.image_dir)):
        edge_path = os.path.join(args.edge_dir, name)
        if not os.path.exists(edge_path):
            continue
        img = np.asarray(Image.open(
            os.path.join(args.image_dir, name)).convert("RGB"))
        sk = np.asarray(Image.open(edge_path).convert("L"))
        if sk.shape != img.shape[:2]:
            sk = np.asarray(Image.open(edge_path).convert("L").resize(
                (img.shape[1], img.shape[0])))
        Image.fromarray(overlay(img, sk)).save(
            os.path.join(args.output_dir, name))
        print(name)


if __name__ == "__main__":
    main()
