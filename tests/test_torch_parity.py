"""Activation-level parity: torch (d2 ResNet semantics) vs our flax backbone.

Builds a torch ResNet-C4 with Detectron2's exact architecture conventions
(7x7/2 stem + 3x3/2 maxpool, bottleneck blocks with stride in the 1x1 conv
["MSRA" style], FrozenBN as eval-mode affine), exports its state dict under d2
names (``stem.conv1.*``, ``res{S}.{i}.conv{j}.*``), round-trips it through
``scripts/convert_torch_weights.py`` + ``checkpoint.load_torch_resnet``, and
asserts the flax backbone reproduces torch activations to ~1e-4.

This is the proof that real MSRA-C4 pickles (ref README.md:18-28,
configs/VOC/VOC-RCNN-101-C4-split1.yaml:3) load correctly: identical
arithmetic + a verified name map; only the torch pickle bytes differ.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unit_tpu.checkpoint import load_torch_resnet  # noqa: E402
from unit_tpu.models.resnet import ResNetC4, Res5, BLOCKS_PER_STAGE  # noqa: E402


class TorchFrozenBN(tnn.Module):
    """d2 FrozenBatchNorm2d: y = (x - mean) / sqrt(var + eps) * w + b."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.register_buffer("weight", torch.randn(c).abs() + 0.5)
        self.register_buffer("bias", torch.randn(c) * 0.1)
        self.register_buffer("running_mean", torch.randn(c) * 0.1)
        self.register_buffer("running_var", torch.rand(c) + 0.5)
        self.eps = eps

    def forward(self, x):
        scale = self.weight / torch.sqrt(self.running_var + self.eps)
        return x * scale[None, :, None, None] + (
            self.bias - self.running_mean * scale
        )[None, :, None, None]


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, cout, cmid, stride=1, shortcut=False):
        super().__init__()
        s1, s3 = stride, 1  # stride_in_1x1=True (MSRA)
        self.conv1 = tnn.Conv2d(cin, cmid, 1, stride=s1, bias=False)
        self.conv1.norm = TorchFrozenBN(cmid)
        self.conv2 = tnn.Conv2d(cmid, cmid, 3, stride=s3, padding=1, bias=False)
        self.conv2.norm = TorchFrozenBN(cmid)
        self.conv3 = tnn.Conv2d(cmid, cout, 1, bias=False)
        self.conv3.norm = TorchFrozenBN(cout)
        if shortcut:
            self.shortcut = tnn.Conv2d(cin, cout, 1, stride=stride, bias=False)
            self.shortcut.norm = TorchFrozenBN(cout)
        else:
            self.shortcut = None

    def forward(self, x):
        out = torch.relu(self.conv1.norm(self.conv1(x)))
        out = torch.relu(self.conv2.norm(self.conv2(out)))
        out = self.conv3.norm(self.conv3(out))
        sc = self.shortcut.norm(self.shortcut(x)) if self.shortcut is not None else x
        return torch.relu(out + sc)


class TorchResNetC4(tnn.Module):
    """stem + res2..res4 (+ separate res5), d2 state-dict naming."""

    def __init__(self, depth=26):
        super().__init__()
        blocks = BLOCKS_PER_STAGE[depth]
        self.stem = tnn.Module()
        self.stem.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.stem.conv1.norm = TorchFrozenBN(64)
        cin, cout = 64, 256
        for si, n in enumerate(blocks[:3]):
            stage = tnn.Sequential(*[
                TorchBottleneck(cin if i == 0 else cout, cout, cout // 4,
                                stride=(2 if si > 0 and i == 0 else 1),
                                shortcut=(i == 0))
                for i in range(n)
            ])
            setattr(self, f"res{si + 2}", stage)
            cin, cout = cout, cout * 2
        self.res5 = tnn.Sequential(*[
            TorchBottleneck(cin if i == 0 else 2048, 2048, 512,
                            stride=(2 if i == 0 else 1), shortcut=(i == 0))
            for i in range(blocks[3])
        ])

    def forward_c4(self, x):
        x = torch.relu(self.stem.conv1.norm(self.stem.conv1(x)))
        x = tnn.functional.max_pool2d(x, 3, stride=2, padding=1)
        for s in (self.res2, self.res3, self.res4):
            x = s(x)
        return x


def _d2_state_dict(model):
    """torch state dict with buffers, keys matching d2 conventions."""
    sd = {}
    for name, t in list(model.state_dict().items()):
        sd[name] = t.numpy()
    return sd


@pytest.mark.slow
def test_backbone_activation_parity(tmp_path):
    torch.manual_seed(0)
    depth = 26
    tmodel = TorchResNetC4(depth=depth).eval()
    # scale conv weights down so deep activations stay O(1)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight *= 0.2

    # --- convert through the real tool (pth -> npz -> flax tree) ---
    pth = tmp_path / "mini_MSRA_C4.pth"
    torch.save({"model": {k: torch.as_tensor(v) for k, v in _d2_state_dict(tmodel).items()}}, pth)
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from convert_torch_weights import convert

    npz = convert(str(pth), str(tmp_path / "mini.npz"))
    sd = dict(np.load(npz))

    backbone = ResNetC4(depth=depth, dtype=jnp.float32)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    params = backbone.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    merged, loaded, skipped = load_torch_resnet(
        {"backbone": params, "box_head": {"res5": Res5(depth=depth, dtype=jnp.float32).init(
            jax.random.PRNGKey(1), jnp.zeros((1, 14, 14, 1024)))["params"]["res5"]}},
        sd, load_res5_into=("box_head",),
    )
    # every backbone/res5 torch tensor must land (no silent skips)
    assert loaded > 0 and not skipped, f"skipped: {skipped[:5]}"

    # --- compare res4 activations ---
    with torch.no_grad():
        t_out = tmodel.forward_c4(torch.as_tensor(x).permute(0, 3, 1, 2))
    f_out = backbone.apply({"params": merged["backbone"]}, jnp.asarray(x))
    t_np = t_out.permute(0, 2, 3, 1).numpy()
    f_np = np.asarray(f_out)
    assert t_np.shape == f_np.shape
    denom = np.abs(t_np).max() + 1e-9
    max_rel = np.abs(t_np - f_np).max() / denom
    assert max_rel < 1e-4, f"res4 max rel diff {max_rel}"

    # --- res5 head on a pooled-like map ---
    pooled = np.random.RandomState(1).rand(2, 14, 14, 1024).astype(np.float32)
    with torch.no_grad():
        t5 = tmodel.res5(torch.as_tensor(pooled).permute(0, 3, 1, 2))
        t5 = t5.mean(dim=(2, 3)).numpy()
    f5 = Res5(depth=depth, dtype=jnp.float32).apply(
        {"params": {"res5": merged["box_head"]["res5"]}}, jnp.asarray(pooled)
    )
    max_rel5 = np.abs(t5 - np.asarray(f5)).max() / (np.abs(t5).max() + 1e-9)
    assert max_rel5 < 1e-4, f"res5 max rel diff {max_rel5}"


def test_caffe2_name_translation():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from convert_torch_weights import caffe2_key_to_d2

    assert caffe2_key_to_d2("conv1_w") == "stem.conv1.weight"
    assert caffe2_key_to_d2("res2_0_branch2a_w") == "res2.0.conv1.weight"
    assert caffe2_key_to_d2("res4_5_branch2c_bn_s") == "res4.5.conv3.norm.weight"
    assert caffe2_key_to_d2("res3_1_branch1_bn_rm") == "res3.1.shortcut.norm.running_mean"
    assert caffe2_key_to_d2("fc1000_w") is None
