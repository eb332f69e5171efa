"""Supervised Fast R-CNN losses and inference (static shapes).

TPU rebuild of Detectron2's FastRCNNOutputs losses used by
SupervisedDetectorOutputsBase.losses (/root/reference/modeling/roi_heads/fast_rcnn.py:435-453)
and of ``fast_rcnn_inference`` (score threshold -> per-class NMS -> top-k,
fast_rcnn.py:455-468).  All inputs are padded with validity masks; the outputs of
inference have a fixed number of detection slots.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops
from ..structures.instances import Detections, SampledProposals
from ..ops import nms as nms_ops

NEG_INF = -1e8  # novel-class mask value during base training (ref uses -inf)


class FastRCNNConfig(NamedTuple):
    num_classes: int
    bbox_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_per_image: int = 100

    @classmethod
    def from_cfg(cls, cfg) -> "FastRCNNConfig":
        return cls(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            bbox_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            topk_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        )


def fast_rcnn_losses(
    scores: jnp.ndarray,          # [N, C+1] (novel columns already masked by caller)
    proposal_deltas: jnp.ndarray, # [N, C*4]
    sampled: SampledProposals,    # flattened batch (leading N)
    cfg: FastRCNNConfig,
):
    """CE (mean over proposals) + class-specific smooth-L1 (sum over fg / N),
    matching FastRCNNOutputs.softmax_cross_entropy_loss / box_reg_loss."""
    c = cfg.num_classes
    valid = sampled.valid
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    logp = jax.nn.log_softmax(scores, axis=-1)
    tgt = jnp.clip(sampled.gt_classes, 0, c)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    loss_cls = jnp.sum(jnp.where(valid, nll, 0.0)) / n_valid

    gt_deltas = box_ops.get_deltas(sampled.boxes, sampled.gt_boxes, cfg.bbox_reg_weights)
    d4 = proposal_deltas.reshape(-1, c, 4)
    cls_idx = jnp.clip(sampled.gt_classes, 0, c - 1)
    sel = jnp.take_along_axis(d4, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    diff = jnp.abs(sel - gt_deltas)
    if cfg.smooth_l1_beta > 1e-5:
        l = jnp.where(
            diff < cfg.smooth_l1_beta,
            0.5 * diff * diff / cfg.smooth_l1_beta,
            diff - 0.5 * cfg.smooth_l1_beta,
        )
    else:
        l = diff
    fg = sampled.is_fg & valid
    loss_box = jnp.sum(jnp.where(fg[:, None], l, 0.0)) / n_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def fast_rcnn_inference_single(
    probs: jnp.ndarray,           # [P, C+1] softmaxed scores
    proposal_deltas: jnp.ndarray, # [P, C*4]
    proposal_boxes: jnp.ndarray,  # [P, 4]
    proposal_valid: jnp.ndarray,  # [P]
    image_size,                   # (H, W), may be traced
    cfg: FastRCNNConfig,
) -> Detections:
    """fast_rcnn_inference for one image with fixed-size output."""
    p = probs.shape[0]
    c = cfg.num_classes

    boxes = box_ops.apply_deltas(proposal_deltas, proposal_boxes, cfg.bbox_reg_weights)
    boxes = box_ops.clip_boxes(boxes.reshape(p, c, 4), image_size)  # [P, C, 4]

    scores = probs[:, :c]  # drop background column
    keep = (scores > cfg.score_thresh) & proposal_valid[:, None]

    flat_boxes = boxes.reshape(p * c, 4)
    flat_scores = scores.reshape(p * c)
    flat_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (p,))
    flat_keep = keep.reshape(p * c)

    idx, ok = nms_ops.batched_nms(
        flat_boxes, flat_scores, flat_classes, cfg.nms_thresh,
        cfg.topk_per_image, valid=flat_keep,
    )
    return Detections(
        boxes=flat_boxes[idx],
        scores=jnp.where(ok, flat_scores[idx], 0.0),
        classes=flat_classes[idx],
        valid=ok,
    )


def mask_novel_scores(scores: jnp.ndarray, novel_ids) -> jnp.ndarray:
    """Novel logits -> -inf during base training (fast_rcnn.py:427-428)."""
    import numpy as np

    if len(novel_ids) == 0:
        return scores
    mask = np.zeros((scores.shape[-1],), np.float32)
    mask[np.asarray(novel_ids)] = 1.0
    return jnp.where(jnp.asarray(mask) > 0, NEG_INF, scores)
