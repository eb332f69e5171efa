"""Fixed-shape instance containers.

TPU replacement for Detectron2's dynamic ``Instances`` (used all over the reference,
e.g. /root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:367): every field
is a padded array with a leading static capacity dimension plus a boolean ``valid``
mask.  These are registered as pytrees so they flow through jit/vmap/scan.
"""

from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp


@chex.dataclass
class GTInstances:
    """Padded ground-truth instances for one image.

    boxes:   [G, 4] XYXY in network-input coordinates
    classes: [G] int32 in [0, C); padded entries are arbitrary
    valid:   [G] bool
    masks:   optional [G, H, W] or [G, M, M] bitmasks (instance segmentation)
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@chex.dataclass
class Proposals:
    """Padded proposal boxes for one image (or a batch, with leading batch dim).

    boxes:      [P, 4] XYXY
    objectness: [P] float (sorted descending where valid)
    valid:      [P] bool
    """

    boxes: jnp.ndarray
    objectness: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]


@chex.dataclass
class SampledProposals:
    """Proposals after IoU matching + subsampling against GT (training).

    boxes:      [S, 4]
    gt_classes: [S] int32 in [0, C] where C is background
    gt_boxes:   [S, 4] matched GT box (for regression targets)
    valid:      [S] bool — sampled slot is real
    is_fg:      [S] bool — foreground (gt_classes < C)
    """

    boxes: jnp.ndarray
    gt_classes: jnp.ndarray
    gt_boxes: jnp.ndarray
    valid: jnp.ndarray
    is_fg: jnp.ndarray
    gt_index: Optional[jnp.ndarray] = None  # [S] matched GT slot (for masks)


@chex.dataclass
class Detections:
    """Final padded detections for one image.

    boxes:   [D, 4] in original-image coordinates
    scores:  [D]
    classes: [D] int32
    valid:   [D] bool
    masks:   optional [D, M, M] mask logits/probabilities
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None
