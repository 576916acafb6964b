"""Torch-side oracles for numeric parity tests.

These re-state the reference semantics in torch (independently written — the
single source of truth for what to match is the reference behavior described
in SURVEY.md §2; tests compare our JAX ops/models against these torch
computations with shared weights).

Helpers also load the *actual* reference modules from /root/reference (read
only, executed in-process) for full-model parity checks.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def reference_opt(**overrides):
    """Namespace with the flags the released test scripts pass."""
    opt = argparse.Namespace(
        use_cam=True,
        pool_type="max",
        no_mask_cc=False,
        no_mask_coarse=False,
        joint_train_inp=True,
        isTrain=False,
    )
    for k, v in overrides.items():
        setattr(opt, k, v)
    return opt


def to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


def hwio_to_oihw(w_hwio: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(w_hwio.transpose(3, 2, 0, 1)))


def torch_gated_conv(x_nchw, w_oihw, b, stride=1, rate=1, activation="elu"):
    """Oracle for gated_conv2d (reference gen_conv semantics)."""
    k = w_oihw.shape[-1]
    p = int(rate * (k - 1) / 2)
    y = F.conv2d(x_nchw, w_oihw, b, stride=stride, padding=p, dilation=rate)
    cout = w_oihw.shape[0]
    if cout == 3 or activation is None:
        return y
    a, g = torch.split(y, cout // 2, dim=1)
    if activation == "elu":
        a = F.elu(a)
    elif activation == "relu":
        a = F.relu(a)
    return a * torch.sigmoid(g)


def torch_contextual_attention(f, b, mask, patch_size=4, stride=2,
                               softmax_scale=10.0, th=0.1):
    """Oracle for contextual_attention: unfold/softmax/fold in torch.

    f, b: (B, C, H, W); mask: (B, 1, h, w) hole mask at feature resolution.
    """
    B, C, H, W = b.shape
    k, s = patch_size, stride
    valid = 1.0 - mask
    bn = b / torch.sqrt((b ** 2).sum(3, keepdim=True).sum(2, keepdim=True) + 1e-8)
    kernel = F.unfold(bn, kernel_size=(k, k), stride=s)            # (B, C*k*k, P)
    P = kernel.shape[-1]
    vker = F.unfold(b, kernel_size=(k, k), stride=s)
    mker = F.unfold(valid, kernel_size=(k, k), stride=s)
    keep = (mker.mean(1) > th).float()                              # (B, P)

    q = F.unfold(f, kernel_size=(k, k), stride=s)                   # (B, C*k*k, N)
    sim = torch.einsum("bdn,bdp->bnp", q, kernel)
    logits = sim * keep[:, None, :] * softmax_scale
    w = torch.softmax(logits, dim=-1)
    outp = torch.einsum("bnp,bdp->bdn", w, vker)
    out = F.fold(outp, output_size=(H, W), kernel_size=(k, k), stride=s)
    return out
