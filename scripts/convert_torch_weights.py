#!/usr/bin/env python
"""Convert reference torch checkpoints to the .npz files our configs name.

The reference initializes from ImageNet-pretrained MSRA-C4 torch pickles
(``models/resnet_{50,101}_MSRA_C4.pth``, /root/reference/README.md:18-28) and
saves trained models as d2 ``{"model": state_dict}`` pickles.  This tool
flattens either into a plain ``.npz`` of numpy arrays keyed by the original
(d2-style) names; ``unit_tpu.checkpoint.load_torch_resnet`` maps those names
into the flax param tree at load time (runner.load_initial_weights accepts
both .pth and the converted .npz).

Also handles caffe2-era MSRA naming (``res2_0_branch2a_w`` ...), translating
it to d2 module names first.

Usage:
  python scripts/convert_torch_weights.py models/resnet_101_MSRA_C4.pth \
      [-o models/resnet_101_MSRA_C4.npz]
"""

import argparse
import os
import pickle
import re
import sys

import numpy as np

_C2_BRANCH = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
              "branch1": "shortcut"}
_C2_SUFFIX = {"w": "weight", "b": "norm.bias", "s": "norm.weight",
              "bn_s": "norm.weight", "bn_b": "norm.bias",
              "bn_rm": "norm.running_mean", "bn_riv": "norm.running_var"}


def caffe2_key_to_d2(key: str):
    """MSRA caffe2 blob name -> d2 module path (None if unrecognized)."""
    m = re.match(r"^conv1_(w|bn_s|bn_b|bn_rm|bn_riv|s|b)$", key)
    if m:
        return f"stem.conv1.{_C2_SUFFIX[m.group(1)]}"
    m = re.match(r"^res(\d)_(\d+)_(branch\d[abc]?)_(w|bn_s|bn_b|bn_rm|bn_riv|s|b)$", key)
    if m:
        stage, block, branch, suf = m.groups()
        conv = _C2_BRANCH.get(branch)
        if conv is None:
            return None
        return f"res{stage}.{block}.{conv}.{_C2_SUFFIX[suf]}"
    return None


def extract_state_dict(obj):
    """Peel d2/torch checkpoint wrappers down to {name: array}."""
    if isinstance(obj, dict):
        for key in ("model", "state_dict", "blobs", "weights"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if k.startswith("_") or k in ("__author__", "__version__"):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        v = np.asarray(v)
        if v.dtype == object:
            continue
        out[k] = v
    return out


def convert(path: str, out_path: str = None) -> str:
    try:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        with open(path, "rb") as f:  # caffe2 pickles load without torch
            obj = pickle.load(f, encoding="latin1")
    sd = extract_state_dict(obj)

    # translate caffe2 names if that's what this is
    if any(re.match(r"^res\d_\d+_branch", k) for k in sd):
        sd = {caffe2_key_to_d2(k) or k: v for k, v in sd.items()}

    out_path = out_path or os.path.splitext(path)[0] + ".npz"
    np.savez(out_path, **sd)
    print(f"{path}: {len(sd)} tensors -> {out_path}")
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    sys.exit(0 if convert(args.input, args.output) else 1)
