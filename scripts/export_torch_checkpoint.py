"""Export sketchedit_tpu .npz checkpoints back to reference-compatible
torch .pth state_dicts (HWIO -> OIHW), so models trained here can be loaded
by the original PyTorch release.

    python scripts/export_torch_checkpoint.py \
        --src checkpoints/run/latest_net_G.npz \
        --dst latest_net_G.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="input .npz params")
    ap.add_argument("--dst", required=True, help="output torch .pth")
    args = ap.parse_args()

    import torch
    from sketchedit_tpu.params.checkpoint import load_network_path
    from sketchedit_tpu.params.torch_convert import params_to_state_dict

    params = load_network_path(args.src)
    state = {k: torch.from_numpy(v.copy())
             for k, v in params_to_state_dict(params).items()
             if not k.endswith(".u")}          # drop SN power-iter vectors
    torch.save(state, args.dst)
    print(f"wrote {len(state)} tensors to {args.dst}")


if __name__ == "__main__":
    main()
