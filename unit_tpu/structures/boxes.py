"""Box geometry primitives (XYXY, absolute coordinates) as pure JAX functions.

TPU-native replacement for Detectron2's ``Boxes`` / ``pairwise_iou`` /
``Box2BoxTransform`` consumed throughout the reference
(e.g. /root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:14,327 and
detectron2.modeling.box_regression).  Everything here operates on plain
``[..., 4]`` float arrays with static shapes; invalid/padded boxes are handled by
callers through validity masks.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Detectron2 clamps dw/dh to log(1000 / 16) before exponentiation.
SCALE_CLAMP = math.log(1000.0 / 16.0)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of XYXY boxes; degenerate boxes get area 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[M, N] intersection areas between two sets of XYXY boxes."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[M, N] IoU. Matches detectron2.structures.pairwise_iou semantics:
    IoU is 0 when the union is empty (degenerate boxes)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)
    a2 = area(boxes2)
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[M, N] intersection-over-area-of-boxes2."""
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = area(boxes2)
    return jnp.where(a2[None, :] > 0, inter / jnp.where(a2[None, :] > 0, a2[None, :], 1.0), 0.0)


def clip_boxes(boxes: jnp.ndarray, image_size: Tuple) -> jnp.ndarray:
    """Clip XYXY boxes to [0, W] x [0, H]. ``image_size`` is (H, W) (may be traced)."""
    h, w = image_size
    h = jnp.asarray(h, boxes.dtype)
    w = jnp.asarray(w, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Boolean mask of boxes with both sides > threshold."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def get_deltas(
    src_boxes: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Box2BoxTransform.get_deltas: encode target boxes relative to source boxes.

    deltas = (wx*dx, wy*dy, ww*log(tw/sw), wh*log(th/sh)) per Faster R-CNN.
    Degenerate source/target boxes produce garbage values — callers mask them.
    """
    src_w = jnp.maximum(src_boxes[..., 2] - src_boxes[..., 0], 1e-6)
    src_h = jnp.maximum(src_boxes[..., 3] - src_boxes[..., 1], 1e-6)
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = jnp.maximum(target_boxes[..., 2] - target_boxes[..., 0], 1e-6)
    tgt_h = jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 1e-6)
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    dx = wx * (tgt_cx - src_cx) / src_w
    dy = wy * (tgt_cy - src_cy) / src_h
    dw = ww * jnp.log(tgt_w / src_w)
    dh = wh * jnp.log(tgt_h / src_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas: decode ``deltas`` on top of ``boxes``.

    ``deltas`` has shape [..., K*4] for K classes (or [..., 4]); ``boxes`` is
    [..., 4]. Returns same shape as ``deltas``.
    """
    orig_shape = deltas.shape
    deltas4 = deltas.reshape(orig_shape[:-1] + (-1, 4))

    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    wx, wy, ww, wh = weights
    dx = deltas4[..., 0] / wx
    dy = deltas4[..., 1] / wy
    dw = jnp.minimum(deltas4[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas4[..., 3] / wh, SCALE_CLAMP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(orig_shape)
