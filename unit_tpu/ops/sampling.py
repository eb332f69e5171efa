"""Static-shape random subsampling of labeled proposals/anchors.

TPU replacement for detectron2.modeling.sampling.subsample_labels (used by the
reference's RPN anchor labeling and ROI-head proposal sampling, SURVEY.md §2.6) and
for ``ROIHeads.label_and_sample_proposals``.  Dynamic-size index selection becomes
rank-based masking: elements are ranked by a random key within their group and the
first ``target`` ranks are selected, so the output shapes are static.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops
from ..structures.instances import GTInstances, SampledProposals
from . import matcher as matcher_ops


def _group_rank(score: jnp.ndarray, member: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each element among ``member`` elements, ordered by ``score``
    descending; non-members get a huge rank."""
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    keyed = jnp.where(member, score, -big)
    order = jnp.argsort(-keyed)  # member elements first, by score desc
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return jnp.where(member, rank, jnp.int32(1 << 30))


def subsample_label_masks(
    key: jax.Array,
    is_pos: jnp.ndarray,
    is_neg: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly select <= num_samples elements with at most ``positive_fraction``
    positives (matching subsample_labels): returns (pos_selected, neg_selected)
    boolean masks over the input."""
    n = is_pos.shape[0]
    rnd = jax.random.uniform(key, (n,))

    num_pos_avail = jnp.sum(is_pos.astype(jnp.int32))
    num_neg_avail = jnp.sum(is_neg.astype(jnp.int32))
    num_pos_target = jnp.minimum(num_pos_avail, int(num_samples * positive_fraction))
    num_neg_target = jnp.minimum(num_neg_avail, num_samples - num_pos_target)

    pos_rank = _group_rank(rnd, is_pos)
    neg_rank = _group_rank(rnd, is_neg)
    pos_sel = pos_rank < num_pos_target
    neg_sel = neg_rank < num_neg_target
    return pos_sel, neg_sel


def label_and_sample_proposals(
    key: jax.Array,
    proposal_boxes: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt: GTInstances,
    num_samples: int,
    positive_fraction: float,
    num_classes: int,
    iou_thresholds: Sequence[float] = (0.5,),
    iou_labels: Sequence[int] = (0, 1),
    append_gt: bool = True,
) -> SampledProposals:
    """Match proposals to GT and subsample a fixed number for the box head.

    Mirrors ``ROIHeads.label_and_sample_proposals`` (with PROPOSAL_APPEND_GT): GT
    boxes are appended as proposals, each proposal is matched by IoU, foreground
    gets its matched gt class, background gets ``num_classes``; then up to
    ``num_samples`` proposals are drawn with at most ``positive_fraction`` fg.
    Output has exactly ``num_samples`` slots (fg slots first) plus a valid mask.
    """
    if append_gt:
        all_boxes = jnp.concatenate([proposal_boxes, gt.boxes], axis=0)
        all_valid = jnp.concatenate([proposal_valid, gt.valid], axis=0)
    else:
        all_boxes = proposal_boxes
        all_valid = proposal_valid

    iou = box_ops.pairwise_iou(gt.boxes, all_boxes)
    m = matcher_ops.match(iou, gt.valid, iou_thresholds, iou_labels, False)

    matched_classes = jnp.where(gt.valid.any(), gt.classes[m.matches], num_classes)
    # label 1 -> fg class, label 0 -> background, label -1 -> ignored
    gt_classes = jnp.where(m.labels == 1, matched_classes, num_classes)
    gt_classes = jnp.where(m.labels == -1, -1, gt_classes)
    gt_classes = jnp.where(all_valid, gt_classes, -1)

    is_fg = (gt_classes >= 0) & (gt_classes < num_classes)
    is_bg = gt_classes == num_classes
    pos_sel, neg_sel = subsample_label_masks(key, is_fg, is_bg, num_samples, positive_fraction)
    selected = pos_sel | neg_sel

    # Gather selected indices into exactly num_samples slots, fg first.
    rnd_tie = jnp.arange(all_boxes.shape[0], dtype=jnp.float32)
    sort_key = (
        jnp.where(selected, 0.0, 1e9)
        + jnp.where(pos_sel, 0.0, 1e6)
        + rnd_tie
    )
    order = jnp.argsort(sort_key)[:num_samples]
    slot_valid = jnp.take(selected, order)

    s_boxes = jnp.take(all_boxes, order, axis=0)
    s_classes = jnp.take(gt_classes, order)
    s_classes = jnp.where(slot_valid, s_classes, num_classes)
    s_gt_boxes = jnp.take(gt.boxes[m.matches], order, axis=0)
    s_is_fg = jnp.take(is_fg, order) & slot_valid

    return SampledProposals(
        boxes=s_boxes,
        gt_classes=s_classes.astype(jnp.int32),
        gt_boxes=s_gt_boxes,
        valid=slot_valid,
        is_fg=s_is_fg,
        gt_index=jnp.take(m.matches, order).astype(jnp.int32),
    )
