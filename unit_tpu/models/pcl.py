"""PCL (Proposal Cluster Learning) weak-detector path, static shapes.

Rebuild of the reference's PCL machinery: graph construction + greedy
center extraction (weak_detector_fast_rcnn.py:410-463), kmeans top-ranking
selection (:465-474), PCL loss-input assembly (:476-519) and the hand-written
PCLFunction loss (pcl_loss.py:8-62).

The PCL loss itself is expressed directly as a differentiable masked formula:
for foreground classes the log of each proposal cluster's *mean* probability is
weighted by the cluster weight (autodiff then reproduces PCLFunction's manual
gradient exactly); background proposals use their own probability.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops
from ..ops import matcher as matcher_ops
from ..ops.kmeans import top_cluster_mask
from .weak_losses import WeakLossConfig, mil_image_scores, binary_cross_entropy


class PCLClusters(NamedTuple):
    """Padded pseudo-GT cluster centers for one image.

    Capacity = C * max_pc_num (max_pc_num centers per present class).
    """

    boxes: jnp.ndarray     # [K, 4]
    classes: jnp.ndarray   # [K]
    scores: jnp.ndarray    # [K]
    valid: jnp.ndarray     # [K]


def _extract_graph_centers(
    boxes: jnp.ndarray,       # [P, 4]
    probs_c: jnp.ndarray,     # [P] this class's probabilities
    cand: jnp.ndarray,        # [P] candidate mask (kmeans top cluster)
    graph_iou_threshold: float,
    max_pc_num: int,
    max_center_iters: int,
):
    """Greedy max-degree center extraction (ref :427-447), statically bounded.

    Returns (center_boxes [max_pc_num, 4], center_scores [max_pc_num],
    center_valid [max_pc_num], used [P] proposals claimed by selected centers).
    """
    p = boxes.shape[0]
    iou = box_ops.pairwise_iou(boxes, boxes)
    adj0 = (iou > graph_iou_threshold) & cand[:, None] & cand[None, :]

    def body(_, carry):
        adj, alive, c_idx, c_score, c_valid, n_centers = carry
        count = jnp.sum(alive.astype(jnp.int32))
        # ref :431-441 is a do-while: the first center is always extracted, then
        # extraction continues while more than 5 candidates remain.
        go = ((n_centers == 0) | (count > 5)) & (count > 0)
        degree = jnp.sum(adj.astype(jnp.int32), axis=1)
        center = jnp.argmax(jnp.where(alive, degree, -1))
        nbr = adj[center] | (alive & (jnp.arange(p) == center))
        score = jnp.max(jnp.where(nbr, probs_c, -jnp.inf))
        c_idx = jnp.where(go, c_idx.at[n_centers].set(center), c_idx)
        c_score = jnp.where(go, c_score.at[n_centers].set(score), c_score)
        c_valid = jnp.where(go, c_valid.at[n_centers].set(True), c_valid)
        new_alive = alive & ~nbr
        alive = jnp.where(go, new_alive, alive)
        adj = jnp.where(go, adj & new_alive[:, None] & new_alive[None, :], adj)
        n_centers = n_centers + jnp.where(go, 1, 0)
        return adj, alive, c_idx, c_score, c_valid, n_centers

    cap = max_center_iters
    init = (
        adj0, cand,
        jnp.zeros((cap,), jnp.int32),
        jnp.full((cap,), -jnp.inf),
        jnp.zeros((cap,), bool),
        jnp.int32(0),
    )
    _, _, c_idx, c_score, c_valid, _ = jax.lax.fori_loop(0, cap, body, init)

    # keep the top-max_pc_num centers by score (ref :447)
    keyed = jnp.where(c_valid, c_score, -jnp.inf)
    top_scores, order = jax.lax.top_k(keyed, max_pc_num)
    sel_idx = c_idx[order]
    sel_valid = jnp.isfinite(top_scores) & c_valid[order]
    sel_boxes = boxes[sel_idx]
    used = jnp.zeros((p,), bool).at[sel_idx].set(sel_valid)
    return sel_boxes, jnp.where(sel_valid, top_scores, 0.0), sel_valid, used


def mine_pcl_clusters(
    scores: jnp.ndarray,      # [P, C'] mining distribution (detached by caller)
    proposals: jnp.ndarray,   # [P, 4]
    valid: jnp.ndarray,       # [P]
    labels: jnp.ndarray,      # [C]
    cfg: WeakLossConfig,
    num_kmeans_cluster: int = 3,
    graph_iou_threshold: float = 0.4,
    max_pc_num: int = 5,
    max_center_iters: int = 32,
) -> PCLClusters:
    """Per-class kmeans filter + graph-center extraction (ref :415-463); chosen
    proposals are removed before the next class."""
    c = cfg.num_classes
    scores = jax.lax.stop_gradient(scores[:, :c])
    eps = 1e-9
    scores = jnp.clip(scores, eps, 1 - eps)

    def per_class(carry, cls_id):
        avail = carry
        present = labels[cls_id] > 0.5
        col = scores[:, cls_id]
        cand = top_cluster_mask(jnp.where(avail, col, -jnp.inf), avail,
                                k=num_kmeans_cluster)
        cand = cand & avail & present
        boxes_k, scores_k, valid_k, used = _extract_graph_centers(
            proposals, col, cand, graph_iou_threshold, max_pc_num, max_center_iters
        )
        valid_k = valid_k & present
        avail = avail & ~jnp.where(present, used, False)
        return avail, (boxes_k, scores_k, valid_k)

    avail0 = valid
    _, (b, s, v) = jax.lax.scan(per_class, avail0, jnp.arange(c))
    classes = jnp.repeat(jnp.arange(c, dtype=jnp.int32)[:, None], b.shape[1], 1)
    return PCLClusters(
        boxes=b.reshape(-1, 4),
        classes=classes.reshape(-1),
        scores=s.reshape(-1),
        valid=v.reshape(-1),
    )


def pcl_targets(clusters: PCLClusters, proposals, valid, cfg: WeakLossConfig):
    """Proposal -> cluster assignment with PCL's fg/bg/ignore rules
    (compute_pcl_loss_inputs, ref :487-507)."""
    iou = box_ops.pairwise_iou(clusters.boxes, proposals)
    m = matcher_ops.match(iou, clusters.valid, [cfg.fg_threshold], [0, 1], False)
    p_labels = jnp.where(m.labels == 1, clusters.classes[m.matches], cfg.num_classes)
    weights = clusters.scores[m.matches]
    weights = jnp.where(m.vals < cfg.bg_threshold, 0.0, weights)  # ig_inds
    assignment = jnp.where(m.vals < cfg.fg_threshold, -1, m.matches)  # bg_inds
    p_labels = jnp.where(valid, p_labels, cfg.num_classes)
    weights = jnp.where(valid, weights, 0.0)
    assignment = jnp.where(valid, assignment, -1)
    return p_labels.astype(jnp.int32), weights, assignment.astype(jnp.int32)


def pcl_loss(
    logits: jnp.ndarray,       # [P, C+1] current OICR iteration logits (live)
    clusters: PCLClusters,
    p_labels: jnp.ndarray,     # [P]
    weights: jnp.ndarray,      # [P]
    assignment: jnp.ndarray,   # [P] cluster index or -1
    valid: jnp.ndarray,        # [P]
    num_classes: int,
    eps: float = 1e-9,
):
    """PCLFunction loss (pcl_loss.py:8-33) as a differentiable expression."""
    p = logits.shape[0]
    probs = jnp.clip(jax.nn.softmax(logits, axis=-1), eps, 1 - eps)
    k = clusters.boxes.shape[0]

    member = (assignment[None, :] == jnp.arange(k)[:, None]) & valid[None, :]  # [K, P]
    member_f = member.astype(probs.dtype)
    count = member_f.sum(-1)
    img_cls_weights = (member_f * weights[None, :]).sum(-1)
    prob_of_cls = jnp.take_along_axis(
        probs, jnp.broadcast_to(clusters.classes[:, None], (k, p)).T, axis=-1
    ).T  # [K, P] each row: probs[:, class_of_cluster_k]
    pc_probs = (member_f * prob_of_cls).sum(-1) / jnp.maximum(count, 1.0)

    fg_term = jnp.where(
        clusters.valid & (count > 0), img_cls_weights * jnp.log(jnp.clip(pc_probs, eps)), 0.0
    ).sum()
    is_bg = (p_labels == num_classes) & valid
    bg_term = jnp.where(is_bg, weights * jnp.log(probs[:, num_classes]), 0.0).sum()
    n_valid = jnp.maximum(jnp.sum(valid.astype(probs.dtype)), 1.0)
    return -(fg_term + bg_term) / n_valid


def pcl_detector_losses(
    streams: Dict,
    proposals: jnp.ndarray,   # [B, P, 4]
    valid: jnp.ndarray,       # [B, P]
    labels: jnp.ndarray,      # [B, C]
    cfg: WeakLossConfig,
    num_kmeans_cluster: int = 3,
    graph_iou_threshold: float = 0.4,
    max_pc_num: int = 5,
) -> Dict[str, jnp.ndarray]:
    """Full weak-branch losses with TYPE='PCL' (losses(), ref :219-238)."""
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

    prev_scores = jax.lax.stop_gradient(mil_scores)
    for idx in range(cfg.oicr_iter):
        oicr_logits = reshape(streams["oicr_scores"][idx])

        def per_image(prev_s, props, val, lab, logits_k):
            clusters = mine_pcl_clusters(
                prev_s, props, val, lab, cfg, num_kmeans_cluster,
                graph_iou_threshold, max_pc_num,
            )
            p_labels, weights, assignment = pcl_targets(clusters, props, val, cfg)
            return pcl_loss(logits_k, clusters, p_labels, weights, assignment, val, c)

        loss_k = jax.vmap(per_image)(prev_scores, proposals, valid, labels, oicr_logits)
        losses[f"loss_oicr_{idx + 1}"] = jnp.mean(loss_k)
        prev_scores = jax.lax.stop_gradient(jax.nn.softmax(oicr_logits, axis=-1))
    return {k: v * cfg.weak_loss_multiplier for k, v in losses.items()}
