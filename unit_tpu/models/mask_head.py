"""Mask heads with base->novel similarity transfer.

Rebuild of /root/reference/modeling/roi_heads/mask_head.py:
``MaskRCNNConvUpsampleHeadWithSimilarity`` (novel-class mask logits are
similarity-weighted combinations of base-class logits, :15-37) and
``…WithFineTune`` (adds a zero-init ``predictor_delta`` conv, :39-94), plus
static-shape equivalents of d2's mask_rcnn_loss / mask_rcnn_inference.

GT masks are carried per instance at a fixed resolution in the GT-box frame
(the TPU-standard替代 for polygon crop_and_resize); the loss re-crops them into
each matched proposal's frame bilinearly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.activations import relu


class MaskRCNNConvUpsampleHead(nn.Module):
    """num_conv 3x3 convs -> 2x deconv -> 1x1 class-wise mask predictor."""

    num_classes: int
    num_conv: int = 0
    conv_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_delta: bool = False):
        """x: [N, H, W, C] ROI features -> mask logits [N, 2H, 2W, num_classes]."""
        x = x.astype(self.dtype)
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding="SAME", kernel_init=init,
                        dtype=self.dtype, name=f"mask_fcn{i + 1}")(x)
            x = relu(x)
        x = nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2), kernel_init=init,
                             dtype=self.dtype, name="deconv")(x)
        x = relu(x)
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=nn.initializers.normal(0.001),
                         dtype=self.dtype, name="predictor")(x).astype(jnp.float32)
        if return_delta:
            delta = nn.Conv(self.num_classes, (1, 1),
                            kernel_init=nn.initializers.zeros,
                            dtype=self.dtype, name="predictor_delta")(x)
            return logits, delta.astype(jnp.float32)
        return logits


def transfer_mask_logits(
    logits: jnp.ndarray,          # [N, H, W, C]
    similarity_seg: jnp.ndarray,  # [V, B] or [N, V, B]
    base_ids: np.ndarray,
    novel_ids: np.ndarray,
) -> jnp.ndarray:
    """Novel channels replaced by similarity combos of base channels; base kept
    (mask_head.py:16-37)."""
    base = logits[..., base_ids]  # [N, H, W, B]
    if similarity_seg.ndim > 2:
        novel = jnp.einsum("nvb,nhwb->nhwv", similarity_seg, base)
    else:
        novel = jnp.einsum("vb,nhwb->nhwv", similarity_seg, base)
    out = jnp.zeros_like(logits)
    out = out.at[..., novel_ids].set(novel)
    out = out.at[..., base_ids].set(base)
    return out


def crop_mask_to_box(
    gt_mask: jnp.ndarray,   # [Mg, Mg] mask in the GT box frame (float 0..1)
    gt_box: jnp.ndarray,    # [4] the frame
    roi_box: jnp.ndarray,   # [4] target crop
    out_size: int,
) -> jnp.ndarray:
    """Bilinearly sample the GT-box-frame mask on the ROI's out_size grid."""
    mg = gt_mask.shape[0]
    gx1, gy1, gx2, gy2 = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    gw = jnp.maximum(gx2 - gx1, 1e-4)
    gh = jnp.maximum(gy2 - gy1, 1e-4)
    ys = roi_box[1] + (jnp.arange(out_size) + 0.5) / out_size * (roi_box[3] - roi_box[1])
    xs = roi_box[0] + (jnp.arange(out_size) + 0.5) / out_size * (roi_box[2] - roi_box[0])
    fy = (ys - gy1) / gh * mg - 0.5
    fx = (xs - gx1) / gw * mg - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, mg - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, mg - 1)
    y1 = jnp.clip(y0 + 1, 0, mg - 1)
    x1 = jnp.clip(x0 + 1, 0, mg - 1)
    wy = jnp.clip(fy - y0, 0, 1)
    wx = jnp.clip(fx - x0, 0, 1)
    oob_y = (fy < -1) | (fy > mg)
    oob_x = (fx < -1) | (fx > mg)
    g = gt_mask
    def at(yi, xi):
        return g[yi.astype(jnp.int32)][:, xi.astype(jnp.int32)]
    val = (
        at(y0, x0) * (1 - wy)[:, None] * (1 - wx)[None]
        + at(y0, x1) * (1 - wy)[:, None] * wx[None]
        + at(y1, x0) * wy[:, None] * (1 - wx)[None]
        + at(y1, x1) * wy[:, None] * wx[None]
    )
    return jnp.where(oob_y[:, None] | oob_x[None], 0.0, val)


def mask_rcnn_loss(
    mask_logits: jnp.ndarray,   # [N, M, M, C]
    pred_classes: jnp.ndarray,  # [N] gt class of each fg proposal
    gt_masks: jnp.ndarray,      # [N, Mg, Mg] matched GT masks (GT-box frame)
    gt_boxes: jnp.ndarray,      # [N, 4]
    roi_boxes: jnp.ndarray,     # [N, 4]
    fg_valid: jnp.ndarray,      # [N]
) -> jnp.ndarray:
    """Per-class BCE over fg proposals (d2 mask_rcnn_loss semantics)."""
    n, m, _, c = mask_logits.shape
    sel = jnp.take_along_axis(
        mask_logits, pred_classes[:, None, None, None].clip(0, c - 1), axis=-1
    )[..., 0]  # [N, M, M]
    targets = jax.vmap(lambda gm, gb, rb: crop_mask_to_box(gm, gb, rb, m))(
        gt_masks, gt_boxes, roi_boxes
    )
    targets = (targets > 0.5).astype(jnp.float32)
    bce = jnp.maximum(sel, 0) - sel * targets + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    per = jnp.mean(bce, axis=(1, 2))
    num = jnp.sum(jnp.where(fg_valid, per, 0.0))
    den = jnp.maximum(jnp.sum(fg_valid.astype(jnp.float32)), 1.0)
    return num / den


def mask_rcnn_inference(
    mask_logits: jnp.ndarray,  # [N, M, M, C]
    classes: jnp.ndarray,      # [N]
) -> jnp.ndarray:
    """Sigmoid probability of each detection's own class channel -> [N, M, M]."""
    c = mask_logits.shape[-1]
    sel = jnp.take_along_axis(
        mask_logits, classes[:, None, None, None].clip(0, c - 1), axis=-1
    )[..., 0]
    return jax.nn.sigmoid(sel)
