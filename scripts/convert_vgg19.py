"""Convert a torchvision VGG19 checkpoint to the npz format VGGLoss reads.

The perceptual loss (train/losses.py) needs ImageNet VGG19 features; this
environment cannot download them, so users convert once from a local
torchvision file:

    python scripts/convert_vgg19.py --src vgg19-dcbb9e9d.pth \
        --dst vgg19_features.npz
    export SKETCHEDIT_VGG_WEIGHTS=vgg19_features.npz
"""

import argparse

import numpy as np


def convert(src: str, dst: str) -> int:
    """torchvision vgg19 state_dict (.pth) -> VGGLoss npz. Returns the
    number of conv layers written."""
    import torch
    state = torch.load(src, map_location="cpu", weights_only=True)

    out = {}
    conv_i = 0
    # torchvision keys: features.{idx}.weight/bias for conv layers
    idxs = sorted({int(k.split(".")[1]) for k in state
                   if k.startswith("features.") and k.endswith(".weight")})
    for idx in idxs:
        w = state[f"features.{idx}.weight"].numpy()       # OIHW
        b = state[f"features.{idx}.bias"].numpy()
        out[f"conv_{conv_i}_w"] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f"conv_{conv_i}_b"] = b
        conv_i += 1
    assert conv_i == 16, f"expected 16 VGG19 convs, found {conv_i}"
    np.savez(dst, **out)
    return conv_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="torchvision vgg19 state_dict (.pth)")
    ap.add_argument("--dst", required=True, help="output .npz")
    args = ap.parse_args()
    n = convert(args.src, args.dst)
    print(f"wrote {n} conv layers to {args.dst}")


if __name__ == "__main__":
    main()
