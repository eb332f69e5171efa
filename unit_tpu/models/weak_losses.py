"""Weakly-supervised detector losses (MIL + OICR), fully batched, static shapes.

TPU-native rebuild of WeakDetectorOutputsBase.losses and its pseudo-GT mining
(/root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:189-255,353-408).
The reference iterates per image and per GT class in Python with dynamic-length
tensors; here every image has a fixed proposal capacity ``P`` with a validity mask
and image-level labels are a multi-hot vector, so the whole batch is one fused
device computation:

  * MIL loss: per-image BCE between the sum over proposals of
    softmax_cls x softmax_det and the image's label vector (ref :202-214).
  * OICR pseudo-GT mining: for each present class (ascending order, matching
    ``torch.unique``), the top-scoring proposal under the *previous* iteration's
    scores becomes a pseudo box whose score is the supervision weight; the chosen
    proposal's score row is zeroed before the next class (ref :353-376).
  * OICR loss: proposals matched to pseudo boxes at IoU >= fg threshold get the
    pseudo class, the rest background; per-proposal weight is the matched pseudo
    score, zeroed below the bg-ignore threshold; weighted CE, mean over proposals
    (ref :378-408, :262-268).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops
from ..ops import matcher as matcher_ops


class WeakLossConfig(NamedTuple):
    num_classes: int
    oicr_iter: int = 3
    fg_threshold: float = 0.5      # ROI_HEADS.IOU_THRESHOLDS[0] via proposal_matcher
    bg_threshold: float = 0.1      # WEAK_DETECTOR.BG_THRESHOLD (ignore weight zeroing)
    mil_multiplier: float = 1.0
    weak_loss_multiplier: float = 1.0
    bbox_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    regression_branch: bool = False
    oicr_regression_branch: bool = False


class PseudoGT(NamedTuple):
    boxes: jnp.ndarray   # [C, 4] per-class top proposal
    scores: jnp.ndarray  # [C] its score under the mining distribution
    valid: jnp.ndarray   # [C] class present in image


def mil_image_scores(
    cls_logits: jnp.ndarray,  # [P, C]
    det_logits: jnp.ndarray,  # [P, C]
    valid: jnp.ndarray,       # [P]
):
    """Two-stream MIL: softmax over classes x softmax over proposals (ref :206-208).

    Returns (mil_scores [P, C], class_vector [C]).
    """
    s_cls = jax.nn.softmax(cls_logits, axis=-1)
    det_masked = jnp.where(valid[:, None], det_logits, -jnp.inf)
    s_det = jax.nn.softmax(det_masked, axis=0)
    s_det = jnp.where(valid[:, None], s_det, 0.0)
    x_r = s_cls * s_det
    x_r = jnp.where(valid[:, None], x_r, 0.0)
    return x_r, jnp.sum(x_r, axis=0)


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-6):
    """Element-mean BCE on probabilities with clamping (ref :257-260)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    loss = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    return jnp.mean(loss)


def mine_pseudo_gt(
    scores: jnp.ndarray,     # [P, C'] mining distribution (C' >= C); detached by caller
    proposals: jnp.ndarray,  # [P, 4]
    valid: jnp.ndarray,      # [P]
    labels: jnp.ndarray,     # [C] multi-hot image labels
    num_classes: int,
) -> PseudoGT:
    """get_proposal_clusters (ref :353-376) over one image, static shapes.

    Sequentially over classes in ascending order (= torch.unique order), pick the
    argmax proposal of that class's score column, then zero that proposal's row.
    """
    scores = jax.lax.stop_gradient(scores[:, :num_classes])
    scores = jnp.where(valid[:, None], scores, -1.0)

    def body(c, carry):
        s, boxes, out_scores = carry
        col = s[:, c]
        idx = jnp.argmax(col)
        present = labels[c] > 0.5
        boxes = boxes.at[c].set(jnp.where(present, proposals[idx], boxes[c]))
        out_scores = out_scores.at[c].set(jnp.where(present, col[idx], 0.0))
        # zero the chosen row so later classes don't re-pick it (ref :364)
        s = jnp.where(present, s.at[idx, :].set(0.0), s)
        return s, boxes, out_scores

    init = (
        scores,
        jnp.zeros((num_classes, 4), proposals.dtype),
        jnp.zeros((num_classes,), scores.dtype),
    )
    _, boxes, out_scores = jax.lax.fori_loop(0, num_classes, body, init)
    return PseudoGT(boxes=boxes, scores=out_scores, valid=labels > 0.5)


def oicr_targets(
    pseudo: PseudoGT,
    proposals: jnp.ndarray,  # [P, 4]
    valid: jnp.ndarray,      # [P]
    cfg: WeakLossConfig,
):
    """Label proposals against pseudo GT (ref compute_loss_inputs :378-408).

    Returns (labels [P] int32 with bg=C, weights [P], matched_slot [P], vals [P]).
    """
    iou = box_ops.pairwise_iou(pseudo.boxes, proposals)
    m = matcher_ops.match(iou, pseudo.valid, [cfg.fg_threshold], [0, 1], False)
    cls_of_slot = jnp.arange(cfg.num_classes, dtype=jnp.int32)
    labels = jnp.where(m.labels == 1, cls_of_slot[m.matches], cfg.num_classes)
    weights = pseudo.scores[m.matches]
    if cfg.bg_threshold > 0.0:
        weights = jnp.where(m.vals < cfg.bg_threshold, 0.0, weights)
    weights = jnp.where(valid, weights, 0.0)
    labels = jnp.where(valid, labels, cfg.num_classes)
    return labels.astype(jnp.int32), weights, m.matches, m.vals


def weighted_ce(
    logits: jnp.ndarray,   # [P, C+1]
    labels: jnp.ndarray,   # [P]
    weights: jnp.ndarray,  # [P]
    valid: jnp.ndarray,    # [P]
):
    """Weighted softmax CE, mean over (real) proposals (ref :262-268)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    num = jnp.sum(jnp.where(valid, nll * weights, 0.0))
    den = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return num / den


def weak_detector_losses(
    streams: Dict,           # WeakDetectorPredictor.__call__ output, leading dim B*P
    proposals: jnp.ndarray,  # [B, P, 4]
    valid: jnp.ndarray,      # [B, P]
    labels: jnp.ndarray,     # [B, C] multi-hot image-level labels
    cfg: WeakLossConfig,
) -> Dict[str, jnp.ndarray]:
    """Full weak-branch loss dict (ref losses() :189-255), OICR path."""
    b, p, _ = proposals.shape
    c = cfg.num_classes

    def reshape(x):
        return x.reshape(b, p, -1)

    cls_logits = reshape(streams["classifier_stream"])
    det_logits = reshape(streams["detection_stream"])

    mil_scores, class_vectors = jax.vmap(mil_image_scores)(cls_logits, det_logits, valid)
    losses = {
        "loss_im_cls": binary_cross_entropy(class_vectors, labels) * cfg.mil_multiplier
    }

    prev_scores = jax.lax.stop_gradient(mil_scores)  # [B, P, C]
    for k in range(cfg.oicr_iter):
        oicr_logits = reshape(streams["oicr_scores"][k])

        def per_image(prev_s, props, val, lab, logits_k):
            pseudo = mine_pseudo_gt(prev_s, props, val, lab, c)
            t_labels, t_weights, _, _ = oicr_targets(pseudo, props, val, cfg)
            return weighted_ce(logits_k, t_labels, t_weights, val)

        loss_k = jax.vmap(per_image)(prev_scores, proposals, valid, labels, oicr_logits)
        losses[f"loss_oicr_{k + 1}"] = jnp.mean(loss_k)
        prev_scores = jax.lax.stop_gradient(jax.nn.softmax(oicr_logits, axis=-1))

    if cfg.regression_branch:
        losses.update(
            _regression_branch_losses(streams, proposals, valid, labels, cfg, b, p)
        )
    return {k: v * cfg.weak_loss_multiplier for k, v in losses.items()}


def _regression_branch_losses(streams, proposals, valid, labels, cfg: WeakLossConfig, b, p):
    """Regression-branch Fast-RCNN loss on OICR-mean pseudo boxes (ref :246-254)."""
    c = cfg.num_classes
    oicr_mean = jnp.mean(
        jnp.stack(
            [jax.nn.softmax(s.reshape(b, p, -1), axis=-1) for s in streams["oicr_scores"]], 0
        ),
        axis=0,
    )
    oicr_mean = jax.lax.stop_gradient(oicr_mean)
    reg_cls = streams["regression_cls"].reshape(b, p, -1)
    reg_bbox = streams["regression_bbox"].reshape(b, p, -1)

    def per_image(prev_s, props, val, lab, logits_k, bbox_k):
        pseudo = mine_pseudo_gt(prev_s, props, val, lab, c)
        t_labels, t_weights, slot, _ = oicr_targets(pseudo, props, val, cfg)
        cls_loss = weighted_ce(logits_k, t_labels, t_weights, val)
        # class-specific smooth-L1 on fg proposals, normalized by proposal count
        # (FastRCNNOutputsRegression -> FastRCNNOutputs.box_reg_loss semantics)
        gt_boxes = pseudo.boxes[slot]
        gt_deltas = box_ops.get_deltas(props, gt_boxes, cfg.bbox_reg_weights)
        bb = bbox_k.reshape(p, c, 4)
        fg = (t_labels < c) & val
        cls_idx = jnp.clip(t_labels, 0, c - 1)
        sel = jnp.take_along_axis(bb, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
        diff = jnp.abs(sel - gt_deltas)
        if cfg.smooth_l1_beta > 1e-5:
            l = jnp.where(
                diff < cfg.smooth_l1_beta,
                0.5 * diff * diff / cfg.smooth_l1_beta,
                diff - 0.5 * cfg.smooth_l1_beta,
            )
        else:
            l = diff
        den = jnp.maximum(jnp.sum(val.astype(jnp.float32)), 1.0)
        bbox_loss = jnp.sum(jnp.where(fg[:, None], l, 0.0)) / den
        return cls_loss, bbox_loss

    cls_l, bbox_l = jax.vmap(per_image)(oicr_mean, proposals, valid, labels, reg_cls, reg_bbox)
    return {
        "loss_regression_cls": jnp.mean(cls_l),
        "loss_regression_bbox": jnp.mean(bbox_l),
    }
