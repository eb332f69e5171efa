"""Anchor generation (static shapes).

Equivalent of Detectron2's DefaultAnchorGenerator requested by the reference's RPN
(SURVEY.md §2.6 "Anchor generation + IoU matching"); anchors for a feature map of a
given static (H, W, stride) are a compile-time constant, so XLA folds them.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax.numpy as jnp


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """[A, 4] XYXY anchors centered at (0, 0).

    Same parameterization as d2's generate_cell_anchors: w = sqrt(size^2 / ar),
    h = ar * w.
    """
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(
    feat_h: int,
    feat_w: int,
    stride: int,
    sizes: Sequence[float],
    aspect_ratios: Sequence[float],
    offset: float = 0.0,
) -> jnp.ndarray:
    """[feat_h * feat_w * A, 4] anchors, ordered (y, x, anchor) row-major to match
    the (H, W, A) layout of the RPN head's predictions."""
    base = cell_anchors(sizes, aspect_ratios)  # [A, 4]
    shift_x = (np.arange(feat_w, dtype=np.float32) + offset) * stride
    shift_y = (np.arange(feat_h, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # [H, W]
    shifts = np.stack([sx, sy, sx, sy], axis=-1)  # [H, W, 4]
    anchors = shifts[:, :, None, :] + base[None, None, :, :]  # [H, W, A, 4]
    return jnp.asarray(anchors.reshape(-1, 4))
