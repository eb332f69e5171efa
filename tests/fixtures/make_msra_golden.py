#!/usr/bin/env python
"""Generate the committed miniature MSRA-C4 golden checkpoint fixture.

The released UniT initialization weights are caffe2-era MSRA pickles
(``models/resnet_101_MSRA_C4.pth``, /root/reference/README.md:18-28) whose
blob names look like ``res2_0_branch2a_w`` / ``..._bn_s``.  This script
freezes a miniature checkpoint in EXACTLY that naming (depth-26 block layout,
narrow widths so the binary stays small enough to commit) together with a
reference input and the torch-computed res4/res5 activations, so
``tests/test_msra_golden.py`` can drive the full user path —
convert_torch_weights -> .npz -> cfg.MODEL.WEIGHTS -> load_initial_weights ->
activation parity — without needing the real 170 MB pickle.

Run once (torch required) to (re)generate:
    python tests/fixtures/make_msra_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, os.path.join(HERE, ".."))

DEPTH = 26            # one bottleneck block per stage (BLOCKS_PER_STAGE[26])
RES2_OUT = 32         # narrow: res2..res5 out channels 32/64/128/256
STEM = 64             # d2 stem width is fixed at 64


def main():
    import torch

    from test_torch_parity import TorchFrozenBN, TorchBottleneck  # noqa: F401
    import torch.nn as tnn

    torch.manual_seed(7)

    stem_conv = tnn.Conv2d(3, STEM, 7, stride=2, padding=3, bias=False)
    stem_bn = TorchFrozenBN(STEM)
    stages = {}
    cin, cout = STEM, RES2_OUT
    for s in (2, 3, 4, 5):
        stride = 1 if s == 2 else 2
        stages[s] = TorchBottleneck(cin, cout, cout // 4, stride=stride,
                                    shortcut=True)
        cin, cout = cout, cout * 2
    with torch.no_grad():
        for m in [stem_conv] + [stages[s] for s in stages]:
            for mm in ([m] if isinstance(m, tnn.Conv2d) else m.modules()):
                if isinstance(mm, tnn.Conv2d):
                    mm.weight *= 0.4

    # ---- caffe2 MSRA blob naming (inverse of convert_torch_weights maps)
    blobs = {}

    def put_conv(prefix, conv, bn):
        blobs[f"{prefix}_w"] = conv.weight.detach().numpy()
        blobs[f"{prefix}_bn_s"] = bn.weight.numpy()
        blobs[f"{prefix}_bn_b"] = bn.bias.numpy()
        blobs[f"{prefix}_bn_rm"] = bn.running_mean.numpy()
        blobs[f"{prefix}_bn_riv"] = bn.running_var.numpy()

    put_conv("conv1", stem_conv, stem_bn)
    for s in (2, 3, 4, 5):
        blk = stages[s]
        put_conv(f"res{s}_0_branch2a", blk.conv1, blk.conv1.norm)
        put_conv(f"res{s}_0_branch2b", blk.conv2, blk.conv2.norm)
        put_conv(f"res{s}_0_branch2c", blk.conv3, blk.conv3.norm)
        put_conv(f"res{s}_0_branch1", blk.shortcut, blk.shortcut.norm)
    blobs["fc1000_w"] = np.zeros((4, 4), np.float32)  # classifier blob: must skip
    blobs["__author__"] = "MSRA golden fixture"

    import torch as _t

    _t.save({"blobs": {k: v for k, v in blobs.items()}},
            os.path.join(HERE, "msra_mini_C4.pth"))

    # ---- torch-computed golden activations
    def forward_c4(x):
        x = torch.relu(stem_bn(stem_conv(x)))
        x = tnn.functional.max_pool2d(x, 3, stride=2, padding=1)
        for s in (2, 3, 4):
            x = stages[s](x)
        return x

    rng = np.random.RandomState(3)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        res4 = forward_c4(torch.as_tensor(x).permute(0, 3, 1, 2))
        pooled = rng.rand(2, 14, 14, RES2_OUT * 4).astype(np.float32)
        res5 = stages[5](torch.as_tensor(pooled).permute(0, 3, 1, 2))
        res5 = res5.mean(dim=(2, 3))
    np.savez(
        os.path.join(HERE, "msra_mini_C4_golden.npz"),
        x=x,
        res4=res4.permute(0, 2, 3, 1).numpy(),
        pooled=pooled,
        res5=res5.numpy(),
    )
    n_bytes = os.path.getsize(os.path.join(HERE, "msra_mini_C4.pth"))
    print(f"wrote msra_mini_C4.pth ({n_bytes/1024:.0f} KiB) + golden activations")


if __name__ == "__main__":
    main()
