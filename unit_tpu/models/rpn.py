"""Region Proposal Network (static shapes, batched).

TPU-native equivalent of the reference's ``WSRPN``
(/root/reference/modeling/proposal_generator/rpn.py:20-53) and the Detectron2 RPN
it subclasses: a 3x3 conv head over res4, anchor labeling with the
low-quality-match rescue, subsampled BCE objectness + smooth-L1 box losses with
optional per-element loss weights (the WSRPN extension), and proposal selection
(pre-NMS top-k -> decode -> clip -> NMS -> post-NMS top-k) with fixed-size padded
outputs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import relu

from ..structures import boxes as box_ops
from ..structures.instances import GTInstances, Proposals
from ..ops import anchors as anchor_ops
from ..ops import matcher as matcher_ops
from ..ops import nms as nms_ops
from ..ops import sampling as sampling_ops


class RPNHead(nn.Module):
    """Standard RPN head: shared 3x3 conv, 1x1 objectness + 1x1 anchor deltas."""

    num_anchors: int
    conv_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """features: [B, H, W, C] -> (logits [B, H*W*A], deltas [B, H*W*A, 4])."""
        init = nn.initializers.normal(stddev=0.01)
        t = nn.Conv(self.conv_dim, (3, 3), padding="SAME", kernel_init=init,
                    dtype=self.dtype, name="conv")(features.astype(self.dtype))
        t = relu(t)
        logits = nn.Conv(self.num_anchors, (1, 1), kernel_init=init,
                         dtype=self.dtype, name="objectness_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init,
                         dtype=self.dtype, name="anchor_deltas")(t)
        b, h, w, _ = logits.shape
        logits = logits.reshape(b, h * w * self.num_anchors).astype(jnp.float32)
        deltas = deltas.reshape(b, h * w * self.num_anchors, 4).astype(jnp.float32)
        return logits, deltas


class RPNConfig(NamedTuple):
    sizes: Sequence[float] = (32, 64, 128, 256, 512)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    stride: int = 16
    iou_thresholds: Sequence[float] = (0.3, 0.7)
    iou_labels: Sequence[int] = (0, -1, 1)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    smooth_l1_beta: float = 0.0
    nms_thresh: float = 0.7
    pre_nms_topk_train: int = 12000
    pre_nms_topk_test: int = 6000
    post_nms_topk_train: int = 2000
    post_nms_topk_test: int = 1000
    min_size: float = 0.0
    boundary_thresh: float = -1.0
    loss_weight: float = 1.0

    @classmethod
    def from_cfg(cls, cfg) -> "RPNConfig":
        return cls(
            sizes=tuple(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]),
            aspect_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
            iou_thresholds=tuple(cfg.MODEL.RPN.IOU_THRESHOLDS),
            iou_labels=tuple(cfg.MODEL.RPN.IOU_LABELS),
            batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            bbox_reg_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
            nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            min_size=float(cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE),
            loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
        )

    @property
    def num_cell_anchors(self) -> int:
        return len(self.sizes) * len(self.aspect_ratios)


def get_anchors(feat_h: int, feat_w: int, cfg: RPNConfig) -> jnp.ndarray:
    return anchor_ops.grid_anchors(feat_h, feat_w, cfg.stride, cfg.sizes, cfg.aspect_ratios)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    if beta <= 1e-5:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def label_anchors(
    key: jax.Array, anchors: jnp.ndarray, gt: GTInstances, cfg: RPNConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single image: returns (labels [N] in {-1, 0, 1} after subsampling,
    matched_gt_boxes [N, 4])."""
    iou = box_ops.pairwise_iou(gt.boxes, anchors)
    m = matcher_ops.match(iou, gt.valid, cfg.iou_thresholds, cfg.iou_labels, True)
    labels = m.labels
    matched = gt.boxes[m.matches]
    pos_sel, neg_sel = sampling_ops.subsample_label_masks(
        key, labels == 1, labels == 0, cfg.batch_size_per_image, cfg.positive_fraction
    )
    out = jnp.where(pos_sel, 1, jnp.where(neg_sel, 0, -1))
    return out.astype(jnp.int32), matched


def rpn_losses(
    key: jax.Array,
    logits: jnp.ndarray,      # [B, N]
    deltas: jnp.ndarray,      # [B, N, 4]
    anchors: jnp.ndarray,     # [N, 4]
    gt: GTInstances,          # batched (leading B)
    cfg: RPNConfig,
    loss_weights: jnp.ndarray | None = None,  # [B] per-image weights (WSRPN)
):
    """Batched RPN losses, normalized like d2 (sum / (B * batch_size_per_image))."""
    b = logits.shape[0]
    keys = jax.random.split(key, b)
    labels, matched = jax.vmap(lambda k, g: label_anchors(k, anchors, g, cfg))(keys, gt)

    valid = labels >= 0
    pos = labels == 1
    gt_deltas = jax.vmap(
        lambda m: box_ops.get_deltas(anchors, m, cfg.bbox_reg_weights)
    )(matched)

    w = jnp.ones((b,), jnp.float32) if loss_weights is None else loss_weights
    normalizer = float(b * cfg.batch_size_per_image)

    loc = smooth_l1(deltas, gt_deltas, cfg.smooth_l1_beta).sum(-1)
    loss_loc = jnp.sum(jnp.where(pos, loc, 0.0) * w[:, None]) / normalizer

    obj = jnp.maximum(logits, 0) - logits * pos.astype(jnp.float32) + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )  # stable BCE-with-logits vs {0, 1} targets
    loss_obj = jnp.sum(jnp.where(valid, obj, 0.0) * w[:, None]) / normalizer
    return {
        "loss_rpn_cls": loss_obj * cfg.loss_weight,
        "loss_rpn_loc": loss_loc * cfg.loss_weight,
    }


def select_proposals(
    logits: jnp.ndarray,   # [B, N]
    deltas: jnp.ndarray,   # [B, N, 4]
    anchors: jnp.ndarray,  # [N, 4]
    image_sizes: jnp.ndarray,  # [B, 2] true (H, W) within the padded canvas
    cfg: RPNConfig,
    training: bool,
) -> Proposals:
    """Batched proposal selection with fixed-size outputs (post_nms_topk slots)."""
    pre_k = min(
        cfg.pre_nms_topk_train if training else cfg.pre_nms_topk_test, logits.shape[1]
    )
    post_k = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test

    def per_image(lg, dl, hw):
        scores, idx = jax.lax.top_k(lg, pre_k)
        boxes = box_ops.apply_deltas(dl[idx], anchors[idx], cfg.bbox_reg_weights)
        boxes = box_ops.clip_boxes(boxes, (hw[0], hw[1]))
        keep = box_ops.nonempty(boxes, cfg.min_size)
        keep &= jnp.isfinite(scores)
        nms_idx, nms_valid = nms_ops.nms(
            boxes, scores, cfg.nms_thresh, post_k, valid=keep
        )
        return Proposals(
            boxes=boxes[nms_idx],
            objectness=scores[nms_idx],
            valid=nms_valid,
        )

    return jax.vmap(per_image)(logits, deltas, image_sizes)
