"""ResNet-C4 backbone + Res5 head in Flax (NHWC, MXU-friendly).

TPU-native equivalent of Detectron2's ``build_resnet_backbone`` requested by the
reference configs (/root/reference/configs/VOC/VOC-RCNN-101-C4-split1.yaml:8) and of
the ``Res5BoxHead`` ROI feature extractor
(/root/reference/modeling/roi_heads/box_head.py:46-89).  BatchNorm is frozen
(affine fold of pretrained statistics) exactly as d2's FrozenBatchNorm2d; freezing
of stages (BACKBONE.FREEZE_AT) is enforced by the optimizer mask in
unit_tpu/solver/build.py, keeping the forward pure.

Compute runs in ``dtype`` (bfloat16 by default on TPU) with fp32 parameters.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import relu

# d2 ResNet stage specs: number of bottleneck blocks per stage for each depth.
BLOCKS_PER_STAGE = {
    26: (1, 1, 1, 1),  # tiny bottleneck variant for fast tests (not in d2)
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBN(nn.Module):
    """BatchNorm with constant statistics and affine params (never updated).

    Matches d2 FrozenBatchNorm2d: y = (x - mean) / sqrt(var + eps) * weight + bias.
    Parameters live in 'params' but are excluded from the optimizer by the solver
    freeze mask (any path containing '/bn').
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        if self.is_mutable_collection("bn_stats"):
            # PreciseBN support (SURVEY.md §7.3 "BN handling"): capture this
            # batch's input statistics so utils.precise_bn can refresh the
            # frozen mean/var over N batches (d2 PreciseBN hook equivalent).
            axes = tuple(range(x.ndim - 1))
            self.sow("bn_stats", "batch_mean", jnp.mean(x, axis=axes))
            self.sow("bn_stats", "batch_var", jnp.var(x, axis=axes))
        scale = weight * jnp.asarray(1.0, jnp.float32) / jnp.sqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    use_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride

        out = nn.Conv(self.bottleneck_channels, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="conv1_bn")(out)
        out = relu(out)

        d = self.dilation
        out = nn.Conv(self.bottleneck_channels, (3, 3), strides=(s3, s3),
                      padding=((d, d), (d, d)), kernel_dilation=(d, d), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="conv2_bn")(out)
        out = relu(out)

        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = FrozenBN(self.out_channels, dtype=self.dtype, name="conv3_bn")(out)

        if self.use_shortcut:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, name="shortcut")(x)
            sc = FrozenBN(self.out_channels, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return relu(out + sc)


class ResNetStage(nn.Module):
    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    first_stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, start_block: int = 0, stop_block: Optional[int] = None):
        stop = self.num_blocks if stop_block is None else stop_block
        assert 0 <= start_block < stop <= self.num_blocks
        for i in range(start_block, stop):
            x = BottleneckBlock(
                out_channels=self.out_channels,
                bottleneck_channels=self.bottleneck_channels,
                stride=self.first_stride if i == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                dilation=self.dilation,
                use_shortcut=(i == 0),
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


def num_units(depth: int) -> int:
    """Number of pipeline-splittable units in a ResNet-C4 backbone.

    Unit 0 is the stem (7x7 conv + maxpool); units 1.. are the individual
    bottleneck blocks of res2..res4 in order.  Every interior bottleneck
    block costs the same FLOPs regardless of stage (spatial shrinks 4x
    exactly as channel FLOPs grow 4x), so block-granular splits give an
    N-stage pipeline near-equal per-stage compute even for R-101, where
    res4 alone holds 23 of the 30 blocks.
    """
    blocks = BLOCKS_PER_STAGE[depth]
    return 1 + blocks[0] + blocks[1] + blocks[2]


class ResNetC4(nn.Module):
    """Stem + res2..res4; output stride 16, 1024 channels (for depth>=50).

    ``start_unit``/``stop_unit`` select a contiguous run of units (0 = stem,
    1.. = each bottleneck block of res2..res4 in order; see ``num_units``)
    so an N-stage pipeline-parallel schedule can place balanced unit groups
    on different 'stage' mesh devices
    (engine/train.py::make_pipeline_train_step).  Both must be static Python
    ints; params are created for the full range at init (defaults), and an
    apply over a sub-range simply reads the subset it needs.
    """

    depth: int = 50
    stride_in_1x1: bool = True
    stem_channels: int = 64
    res2_out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, start_unit: int = 0, stop_unit: Optional[int] = None):
        blocks = BLOCKS_PER_STAGE[self.depth]
        n_units = num_units(self.depth)
        stop = n_units if stop_unit is None else stop_unit
        assert 0 <= start_unit < stop <= n_units
        x = x.astype(self.dtype)
        if start_unit == 0:
            x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="stem_conv1")(x)
            x = FrozenBN(self.stem_channels, dtype=self.dtype, name="stem_conv1_bn")(x)
            x = relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        out_ch = self.res2_out_channels
        bottleneck = out_ch // 4
        unit = 1  # first block of res2
        for stage_idx in range(3):  # res2, res3, res4
            nb = blocks[stage_idx]
            lo = max(start_unit - unit, 0)
            hi = min(stop - unit, nb)
            if hi > lo:
                x = ResNetStage(
                    num_blocks=nb,
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck,
                    first_stride=1 if stage_idx == 0 else 2,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"res{stage_idx + 2}",
                )(x, start_block=lo, stop_block=hi)
            unit += nb
            out_ch *= 2
            bottleneck *= 2
        return x  # res4: [N, H/16, W/16, 1024]


class Res5(nn.Module):
    """res5 stage applied to pooled ROI features — the C4 box feature extractor.

    Equivalent to the reference's Res5BoxHead (box_head.py:46-89): res5 with
    first_stride 2 over the 14x14 pooled map -> 7x7x2048, then spatial mean.
    """

    depth: int = 50
    stride_in_1x1: bool = True
    res2_out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, spatial_mean: bool = True):
        blocks = BLOCKS_PER_STAGE[self.depth]
        out_ch = self.res2_out_channels * 8  # 2048
        x = x.astype(self.dtype)
        x = ResNetStage(
            num_blocks=blocks[3],
            out_channels=out_ch,
            bottleneck_channels=out_ch // 4,
            first_stride=2,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            name="res5",
        )(x)
        if spatial_mean:
            x = jnp.mean(x, axis=(-3, -2))  # [N, 2048]
        return x
