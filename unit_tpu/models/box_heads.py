"""ROI box feature extractors beyond Res5.

Rebuild of /root/reference/modeling/roi_heads/box_head.py: ``Res5BoxHead`` (the
default; lives in resnet.Res5), ``VGGConvFCHead`` (:18-44), ``VGGCNNFBoxHead``
(fc6/fc7, :143-166) and ``InceptionResNetHead`` (:168-207, reduced to its
stride-2 conv stack + spatial mean).  All map [N, P, P, C] pooled ROIs to a flat
feature vector for the predictors.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.registry import Registry

BOX_HEAD_REGISTRY = Registry("BOX_HEAD")


@BOX_HEAD_REGISTRY.register()
class VGGConvFCHead(nn.Module):
    """conv stack + two FCs (VGG16 fast-rcnn style)."""

    fc_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        x = x.astype(self.dtype)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc7")(x))
        return x.astype(jnp.float32)


@BOX_HEAD_REGISTRY.register()
class VGGCNNFBoxHead(nn.Module):
    """Caffe VGG-CNN-F fc6/fc7 head (4096-d)."""

    fc_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        x = x.astype(self.dtype)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc7")(x))
        return x.astype(jnp.float32)


@BOX_HEAD_REGISTRY.register()
class InceptionResNetHead(nn.Module):
    """Inception-ResNet block8 stage over pooled ROIs, then spatial mean."""

    channels: int = 1536
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, name="conv7a")(x))
        for i in range(2):
            b0 = nn.relu(nn.Conv(192, (1, 1), dtype=self.dtype, name=f"b8_{i}_b0")(x))
            b1 = nn.relu(nn.Conv(192, (1, 1), dtype=self.dtype, name=f"b8_{i}_b1_0")(x))
            b1 = nn.relu(nn.Conv(224, (1, 3), padding="SAME", dtype=self.dtype,
                                 name=f"b8_{i}_b1_1")(b1))
            b1 = nn.relu(nn.Conv(256, (3, 1), padding="SAME", dtype=self.dtype,
                                 name=f"b8_{i}_b1_2")(b1))
            up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name=f"b8_{i}_up")(
                jnp.concatenate([b0, b1], -1)
            )
            x = nn.relu(x + 0.2 * up)
        if spatial_mean:
            x = jnp.mean(x, axis=(-3, -2))
        return x.astype(jnp.float32)
