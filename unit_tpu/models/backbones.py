"""Alternative backbones: VGG16, VGG-CNN-F, InceptionResNetV2.

Rebuild of /root/reference/modeling/backbone/{backbone.py,vgg_cnn_f.py,
inception_resnet_v2.py}: the weakly-supervised "note"/"dock" experiment suites
use VGG16 (optionally dilated), the Caffe VGG-CNN-F (with LRN), and
InceptionResNetV2 cut at the stride-16 ``block17`` stage.  All emit a stride-16
feature map like ResNet-C4 so the RPN/ROI plumbing is shared; BACKBONE.NAME
selects via :data:`BACKBONE_REGISTRY`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import relu

from ..utils.registry import Registry
from .resnet import ResNetC4

BACKBONE_REGISTRY = Registry("BACKBONE")


def conv(ch, k, s=1, p="SAME", name=None, dtype=jnp.float32):
    return nn.Conv(ch, (k, k), strides=(s, s), padding=p, dtype=dtype, name=name)


class LocalResponseNorm(nn.Module):
    """Caffe-style LRN across channels (VGG-CNN-F, vgg_cnn_f.py:31-65)."""

    size: int = 5
    alpha: float = 1e-4
    beta: float = 0.75
    k: float = 2.0

    @nn.compact
    def __call__(self, x):
        sq = x * x
        half = self.size // 2
        pads = [(0, 0)] * (x.ndim - 1) + [(half, half)]
        padded = jnp.pad(sq, pads)
        acc = jnp.zeros_like(x)
        for i in range(self.size):
            acc = acc + jax.lax.dynamic_slice_in_dim(
                padded, i, x.shape[-1], axis=x.ndim - 1
            )
        return x / (self.k + self.alpha * acc) ** self.beta


@BACKBONE_REGISTRY.register(name="build_vgg_backbone")
class VGG16(nn.Module):
    """torchvision VGG16 features through conv5_3 (backbone.py:58-80).

    With ``dilated=True`` the last pooling is dropped and conv5 uses dilation 2,
    keeping stride 16 output at higher detail (as the reference's DILATED flag).
    """

    dilated: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        cfg = [(2, 64), (2, 128), (3, 256), (3, 512)]
        idx = 0
        for block, (n, ch) in enumerate(cfg):
            for i in range(n):
                x = relu(conv(ch, 3, name=f"conv{idx}", dtype=self.dtype)(x))
                idx += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        d = 2 if self.dilated else 1
        for i in range(3):
            x = relu(
                nn.Conv(512, (3, 3), kernel_dilation=(d, d), padding="SAME",
                        dtype=self.dtype, name=f"conv{idx}")(x)
            )
            idx += 1
        return x  # stride 16, 512 channels


@BACKBONE_REGISTRY.register(name="build_vgg_cnn_f_backbone")
class VGGCNNF(nn.Module):
    """Caffe VGG-CNN-F: 5 convs with LRN after conv1/conv2 (vgg_cnn_f.py)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = relu(nn.Conv(64, (11, 11), strides=(4, 4), padding=((0, 0), (0, 0)),
                            dtype=self.dtype, name="conv1")(x))
        x = LocalResponseNorm(name="norm1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        x = relu(conv(256, 5, p="SAME", name="conv2", dtype=self.dtype)(x))
        x = LocalResponseNorm(name="norm2")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
        x = relu(conv(256, 3, name="conv3", dtype=self.dtype)(x))
        x = relu(conv(256, 3, name="conv4", dtype=self.dtype)(x))
        x = relu(conv(256, 3, name="conv5", dtype=self.dtype)(x))
        return x


class _IRBlock35(nn.Module):
    dtype: Any = jnp.float32
    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = relu(conv(32, 1, name="b0", dtype=self.dtype)(x))
        b1 = relu(conv(32, 1, name="b1_0", dtype=self.dtype)(x))
        b1 = relu(conv(32, 3, name="b1_1", dtype=self.dtype)(b1))
        b2 = relu(conv(32, 1, name="b2_0", dtype=self.dtype)(x))
        b2 = relu(conv(48, 3, name="b2_1", dtype=self.dtype)(b2))
        b2 = relu(conv(64, 3, name="b2_2", dtype=self.dtype)(b2))
        up = conv(x.shape[-1], 1, name="up", dtype=self.dtype)(
            jnp.concatenate([b0, b1, b2], -1)
        )
        return relu(x + self.scale * up)


class _IRBlock17(nn.Module):
    dtype: Any = jnp.float32
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = relu(conv(192, 1, name="b0", dtype=self.dtype)(x))
        b1 = relu(conv(128, 1, name="b1_0", dtype=self.dtype)(x))
        b1 = relu(nn.Conv(160, (1, 7), padding="SAME", dtype=self.dtype,
                             name="b1_1")(b1))
        b1 = relu(nn.Conv(192, (7, 1), padding="SAME", dtype=self.dtype,
                             name="b1_2")(b1))
        up = conv(x.shape[-1], 1, name="up", dtype=self.dtype)(
            jnp.concatenate([b0, b1], -1)
        )
        return relu(x + self.scale * up)


@BACKBONE_REGISTRY.register(name="build_inception_resnet_v2_backbone")
class InceptionResNetV2(nn.Module):
    """InceptionResNetV2 cut after the block17 (stride-16) stage
    (backbone.py:103-152, inception_resnet_v2.py)."""

    num_block35: int = 10
    num_block17: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = relu(conv(32, 3, 2, p=((0, 0), (0, 0)), name="conv2d_1a", dtype=self.dtype)(x))
        x = relu(conv(32, 3, 1, p=((0, 0), (0, 0)), name="conv2d_2a", dtype=self.dtype)(x))
        x = relu(conv(64, 3, 1, name="conv2d_2b", dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = relu(conv(80, 1, p=((0, 0), (0, 0)), name="conv2d_3b", dtype=self.dtype)(x))
        x = relu(conv(192, 3, p=((0, 0), (0, 0)), name="conv2d_4a", dtype=self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # mixed_5b
        b0 = relu(conv(96, 1, name="m5b_b0", dtype=self.dtype)(x))
        b1 = relu(conv(48, 1, name="m5b_b1_0", dtype=self.dtype)(x))
        b1 = relu(conv(64, 5, name="m5b_b1_1", dtype=self.dtype)(b1))
        b2 = relu(conv(64, 1, name="m5b_b2_0", dtype=self.dtype)(x))
        b2 = relu(conv(96, 3, name="m5b_b2_1", dtype=self.dtype)(b2))
        b2 = relu(conv(96, 3, name="m5b_b2_2", dtype=self.dtype)(b2))
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = relu(conv(64, 1, name="m5b_b3", dtype=self.dtype)(b3))
        x = jnp.concatenate([b0, b1, b2, b3], -1)
        for i in range(self.num_block35):
            x = _IRBlock35(dtype=self.dtype, name=f"block35_{i}")(x)
        # mixed_6a (stride 2 -> total 16)
        b0 = relu(conv(384, 3, 2, p=((0, 0), (0, 0)), name="m6a_b0", dtype=self.dtype)(x))
        b1 = relu(conv(256, 1, name="m6a_b1_0", dtype=self.dtype)(x))
        b1 = relu(conv(256, 3, name="m6a_b1_1", dtype=self.dtype)(b1))
        b1 = relu(conv(384, 3, 2, p=((0, 0), (0, 0)), name="m6a_b1_2", dtype=self.dtype)(b1))
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b0, b1, b2], -1)
        for i in range(self.num_block17):
            x = _IRBlock17(dtype=self.dtype, name=f"block17_{i}")(x)
        return x  # stride 16, 1088 channels


@BACKBONE_REGISTRY.register(name="build_resnet_backbone")
def build_resnet(cfg, dtype):
    return ResNetC4(
        depth=cfg.MODEL.RESNETS.DEPTH,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        stem_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        dtype=dtype,
    )


# aliases matching the reference's registry names (backbone.py:58,82,103)
BACKBONE_REGISTRY.register(BACKBONE_REGISTRY.get("build_vgg_backbone"), name="VGG")
BACKBONE_REGISTRY.register(
    BACKBONE_REGISTRY.get("build_vgg_cnn_f_backbone"), name="VGG_CNN_F"
)
BACKBONE_REGISTRY.register(
    BACKBONE_REGISTRY.get("build_inception_resnet_v2_backbone"),
    name="InceptionResNetV2",
)


def build_backbone(cfg, dtype, name: str | None = None):
    key = name or cfg.MODEL.BACKBONE.NAME
    entry = BACKBONE_REGISTRY.get(key)
    if key == "build_resnet_backbone":
        return entry(cfg, dtype)
    if key == "build_vgg_backbone":
        return entry(dilated=cfg.MODEL.BACKBONE.DILATED, dtype=dtype)
    return entry(dtype=dtype)
