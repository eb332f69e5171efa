"""ROI box feature extractors beyond Res5.

Rebuild of /root/reference/modeling/roi_heads/box_head.py: ``Res5BoxHead`` (the
default; lives in resnet.Res5), ``VGGConvFCHead`` (vgg16 classifier[:-1] with
dropout, :18-44), ``VGGCNNFBoxHead`` (fc6/fc7 + dropout, :143-166) and the full
``InceptionResNetHead`` (mixed_7a -> 9x block8 -> final block8 -> conv2d_7b ->
avgpool, :168-207).  All map [N, P, P, C] pooled ROIs to a flat feature vector
for the predictors.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import relu

from ..utils.registry import Registry

BOX_HEAD_REGISTRY = Registry("BOX_HEAD")


class _TwoFC(nn.Module):
    """fc6/fc7 with the torch classifier's post-ReLU dropout.  Dropout only
    activates when a 'dropout' rng is supplied to apply() (the train step does;
    eval never passes one), matching torch train/eval-mode semantics."""

    fc_dim: int = 4096
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_dropout = self.has_rng("dropout")
        x = relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(self.dropout, deterministic=not use_dropout)(x)
        x = relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(self.dropout, deterministic=not use_dropout)(x)
        return x


@BOX_HEAD_REGISTRY.register()
class VGGConvFCHead(nn.Module):
    """torchvision VGG16 ``classifier[:-1]`` over flattened pooled ROIs:
    Linear(4096)+ReLU+Dropout, Linear(4096)+ReLU+Dropout.  The reference's
    VGGConvFCHead keeps ONLY this fc stack (box_head.py:18-31 via
    ``extract_components``: ``fc = model.classifier[:-1]``); the VGG conv stack
    lives in the backbone."""

    fc_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        x = x.astype(self.dtype)
        x = x.reshape(x.shape[0], -1)
        x = _TwoFC(self.fc_dim, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


@BOX_HEAD_REGISTRY.register()
class VGGCNNFBoxHead(nn.Module):
    """Caffe VGG-CNN-F fc6/fc7 head, 4096-d with dropout
    (box_head.py:143-166 via extract_vgg_cnn_f_components)."""

    fc_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        x = x.astype(self.dtype)
        x = x.reshape(x.shape[0], -1)
        x = _TwoFC(self.fc_dim, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


class _Block8(nn.Module):
    """Inception-ResNet-v2 Block8 (1x1 / 1x3+3x1 branches, residual scale)."""

    scale: float = 0.2
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b0 = relu(nn.Conv(192, (1, 1), use_bias=False, dtype=self.dtype,
                             name="b0")(x))
        b1 = relu(nn.Conv(192, (1, 1), use_bias=False, dtype=self.dtype,
                             name="b1_0")(x))
        b1 = relu(nn.Conv(224, (1, 3), padding="SAME", use_bias=False,
                             dtype=self.dtype, name="b1_1")(b1))
        b1 = relu(nn.Conv(256, (3, 1), padding="SAME", use_bias=False,
                             dtype=self.dtype, name="b1_2")(b1))
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="up")(
            jnp.concatenate([b0, b1], -1)
        )
        x = x + self.scale * up
        return relu(x) if self.relu else x


@BOX_HEAD_REGISTRY.register()
class InceptionResNetHead(nn.Module):
    """Full InceptionResNetV2 tail over pooled ROIs (box_head.py:168-207):
    ``mixed_7a`` reduction -> ``repeat_2`` (9x Block8, scale 0.2) -> final
    ``block8`` (scale 1, no ReLU) -> ``conv2d_7b`` 1x1 to 1536 -> global
    average pool.  BatchNorm is folded into the convs (documented deviation:
    no pretrained ImageNet weights are loadable in this environment, so the
    affine fold is exact at init and the stats-free form trains the same)."""

    num_block8: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        x = x.astype(self.dtype)
        # mixed_7a: three conv branches (stride-2 VALID) + maxpool -> 2080ch
        b0 = relu(nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                             name="m7a_b0_0")(x))
        b0 = relu(nn.Conv(384, (3, 3), strides=(2, 2), padding="VALID",
                             use_bias=False, dtype=self.dtype, name="m7a_b0_1")(b0))
        b1 = relu(nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                             name="m7a_b1_0")(x))
        b1 = relu(nn.Conv(288, (3, 3), strides=(2, 2), padding="VALID",
                             use_bias=False, dtype=self.dtype, name="m7a_b1_1")(b1))
        b2 = relu(nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                             name="m7a_b2_0")(x))
        b2 = relu(nn.Conv(288, (3, 3), padding="SAME", use_bias=False,
                             dtype=self.dtype, name="m7a_b2_1")(b2))
        b2 = relu(nn.Conv(320, (3, 3), strides=(2, 2), padding="VALID",
                             use_bias=False, dtype=self.dtype, name="m7a_b2_2")(b2))
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b0, b1, b2, b3], -1)
        # repeat_2: 9x Block8(scale=0.2)
        for i in range(self.num_block8):
            x = _Block8(scale=0.2, dtype=self.dtype, name=f"block8_{i}")(x)
        # final block8 (scale 1.0, no relu) + conv2d_7b
        x = _Block8(scale=1.0, relu=False, dtype=self.dtype, name="block8_final")(x)
        x = relu(nn.Conv(1536, (1, 1), use_bias=False, dtype=self.dtype,
                            name="conv2d_7b")(x))
        if spatial_mean:
            x = jnp.mean(x, axis=(-3, -2))  # avgpool_1a + flatten
        return x.astype(jnp.float32)
