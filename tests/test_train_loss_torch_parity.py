"""Full training-loss parity: torch assembly of the reference's TRAIN semantics
vs our ``WSRCNN.train_losses``.

Sequel to tests/test_full_graph_torch_parity.py (which pins the frozen
inference graph): this pins the TRAINING objective — every loss term of the
reference's base-training step (TrainerNoMeta / WeaklySupervisedRCNNNoMeta)
computed by an independent torch/numpy assembly with SHARED weights on the
same strong + weak batches, and compared scalar-for-scalar:

  loss_rpn_cls / loss_rpn_loc   d2 RPN losses: anchor matching (0.3/0.7 bands
                                + low-quality rescue), subsampled BCE +
                                smooth-L1 over positives, normalized by
                                B * RPN.BATCH_SIZE_PER_IMAGE
  loss_cls / loss_box_reg       SupervisedDetectorOutputsBase.losses
                                (/root/reference/modeling/roi_heads/fast_rcnn.py:384-453):
                                combined logits = delta + OICR-mean of the
                                no-grad weak evaluation, novel columns -inf,
                                CE mean + class-specific smooth-L1 sum / N
  loss_im_cls                   two-stream MIL BCE
                                (weak_detector_fast_rcnn.py:202-214)
  loss_oicr_{1..3}              OICR refinement: pseudo-GT mining from the
                                previous iteration's scores + weighted CE
                                (weak_detector_fast_rcnn.py:219-243,353-408)

Randomized subsampling is the one non-deterministic step of the reference
train path; both stacks reduce it to the identity by configuration, NOT by
patching: RPN.BATCH_SIZE_PER_IMAGE is set above the anchor count and
ROI batch size above the candidate count (with positive fractions that cap
above the available positives), so d2's subsample_labels — and our
rank-mask equivalent — provably select EVERYTHING and the sampled sets
coincide without sharing any RNG.  Loss reductions are order-free
(means/sums over the same sets), so slot ordering differences don't matter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unit_tpu.models import rpn as rpn_lib  # noqa: E402
from unit_tpu.models import fast_rcnn as frcnn  # noqa: E402
from unit_tpu.models import similarity as sim_lib  # noqa: E402
from unit_tpu.models.meta_arch import ModelConfig, WSRCNN  # noqa: E402

from test_torch_parity import TorchResNetC4  # noqa: E402
from test_full_graph_torch_parity import (  # noqa: E402
    BASE_IDS,
    NOVEL_IDS,
    PIXEL_MEAN,
    np_anchors,
    np_select_proposals,
    np_iou_one_to_many,
    randomize_params,
    t,
    set_conv,
    set_bn,
    copy_stage,
    make_linear,
    torch_roi_align_v2,
)

POST_K = 96
WEAK_P = 48
RPN_BSPI = 4096        # > anchor count -> RPN subsampling keeps everything
ROI_BATCH = 128        # > POST_K + max GT -> ROI sampling keeps everything
NEG_INF = -1e8
C = 20


def np_pairwise_iou(a, b):
    return np.stack([np_iou_one_to_many(x, b) for x in a])


def np_match(iou, thresholds, labels, allow_low_quality):
    """d2 Matcher: per-prediction argmax over gt, threshold-banded labels,
    optional best-anchor-per-gt rescue (labels only; matches stay argmax)."""
    matches = iou.argmax(0)
    vals = iou.max(0)
    out = np.full(iou.shape[1], labels[0], np.int64)
    edges = [-np.inf] + list(thresholds) + [np.inf]
    for lbl, lo, hi in zip(labels, edges[:-1], edges[1:]):
        out[(vals >= lo) & (vals < hi)] = lbl
    if allow_low_quality:
        best_per_gt = iou.max(1)
        rescued = (iou == best_per_gt[:, None]).any(0)
        out[rescued] = 1
    return matches, out, vals


def np_get_deltas(src, tgt, w=(1.0, 1.0, 1.0, 1.0)):
    sw = np.maximum(src[:, 2] - src[:, 0], 1e-6)
    sh = np.maximum(src[:, 3] - src[:, 1], 1e-6)
    scx = src[:, 0] + 0.5 * sw
    scy = src[:, 1] + 0.5 * sh
    tw = np.maximum(tgt[:, 2] - tgt[:, 0], 1e-6)
    th = np.maximum(tgt[:, 3] - tgt[:, 1], 1e-6)
    tcx = tgt[:, 0] + 0.5 * tw
    tcy = tgt[:, 1] + 0.5 * th
    return np.stack(
        [
            w[0] * (tcx - scx) / sw,
            w[1] * (tcy - scy) / sh,
            w[2] * np.log(tw / sw),
            w[3] * np.log(th / sh),
        ],
        -1,
    )


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_mil(cls_logits, det_logits):
    """Two-stream MIL for one image, all proposals valid
    (weak_detector_fast_rcnn.py:148-163,202-214)."""
    x_r = np_softmax(cls_logits, -1) * np_softmax(det_logits, 0)
    class_vec = x_r.sum(0)
    p = np.clip(class_vec, 1e-6, 1 - 1e-6)
    return x_r, p


def np_mine_and_label(prev_scores, boxes, labels, fg_thr=0.5, bg_thr=0.1):
    """Pseudo-GT mining (ascending class order, chosen row zeroed) + proposal
    labeling with matched-value bg zeroing (weak_detector_fast_rcnn.py:353-408)."""
    s = prev_scores[:, :C].copy()
    gt_boxes, gt_scores, gt_classes = [], [], []
    for c in range(C):
        if labels[c] <= 0.5:
            continue
        idx = int(np.argmax(s[:, c]))
        gt_boxes.append(boxes[idx].copy())
        gt_scores.append(s[idx, c])
        gt_classes.append(c)
        s[idx, :] = 0.0
    gt_boxes = np.asarray(gt_boxes)
    p = len(boxes)
    out_labels = np.full(p, C, np.int64)
    out_weights = np.zeros(p)
    for i in range(p):
        ious = [np_iou_one_to_many(g, boxes[i : i + 1])[0] for g in gt_boxes]
        j = int(np.argmax(ious))
        out_weights[i] = gt_scores[j]
        if ious[j] >= fg_thr:
            out_labels[i] = gt_classes[j]
        if ious[j] < bg_thr:
            out_weights[i] = 0.0
    return out_labels, out_weights


def np_weighted_ce(logits, labels, weights):
    logp = logits - logits.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    nll = -logp[np.arange(len(labels)), labels]
    return float((nll * weights).sum() / len(labels))


@pytest.mark.slow
def test_train_loss_parity():
    depth = 26
    B, H, W = 2, 224, 288
    G = 4  # GT capacity per image (3 valid)
    mc = ModelConfig(
        depth=depth,
        num_classes=C,
        base_ids=BASE_IDS,
        novel_ids=NOVEL_IDS,
        multi_box_head=True,
        oicr_iter=3,
        compute_dtype="float32",
        roi_align_impl="xla",
        roi_batch_size=ROI_BATCH,
        roi_positive_fraction=1.0,   # cap above available fg -> keep all
        weak_proposal_count=WEAK_P,
        rpn=rpn_lib.RPNConfig(
            post_nms_topk_train=POST_K,
            post_nms_topk_test=POST_K,
            batch_size_per_image=RPN_BSPI,  # > anchors -> keep all
            positive_fraction=0.5,
        ),
        frcnn=frcnn.FastRCNNConfig(num_classes=C),
        sim=sim_lib.SimilarityConfig(
            terms=(("cls", ("lingual",)), ("bbox", ("lingual",))),
            base_ids=BASE_IDS,
            novel_ids=NOVEL_IDS,
            coco_indexer=tuple(sim_lib.coco_indexer_for(sim_lib.VOC_CLASSES)),
        ),
    )
    model = WSRCNN(mc=mc)

    rng = np.random.RandomState(17)
    s_images = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    w_images = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    sizes = np.asarray([[H, W]] * B, np.float32)

    # base-class GT only (base training: novel logits are -inf masked)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_boxes[..., 0] = rng.uniform(0, W - 90, (B, G))
    gt_boxes[..., 1] = rng.uniform(0, H - 90, (B, G))
    gt_boxes[..., 2] = gt_boxes[..., 0] + rng.uniform(40, 80, (B, G))
    gt_boxes[..., 3] = gt_boxes[..., 1] + rng.uniform(40, 80, (B, G))
    gt_classes = np.asarray(rng.choice(BASE_IDS, (B, G)), np.int32)
    gt_valid = np.asarray([[True, True, True, False]] * B)

    # weak image-level labels: mixed base + novel classes
    w_labels = np.zeros((B, C), np.float32)
    w_labels[0, [BASE_IDS[0], NOVEL_IDS[1], BASE_IDS[7]]] = 1.0
    w_labels[1, [NOVEL_IDS[0], BASE_IDS[3]]] = 1.0

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(s_images[:1]),
        jnp.asarray(sizes[:1]),
    )
    params = randomize_params(variables["params"], seed=5)

    # ------------------- our stack: one training step's loss dict ------------
    strong = {
        "image": jnp.asarray(s_images),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "image_size": jnp.asarray(sizes),
    }
    weak = {
        "image": jnp.asarray(w_images),
        "labels": jnp.asarray(w_labels),
        "image_size": jnp.asarray(sizes),
    }
    losses_j = model.apply(
        {"params": params}, jax.random.PRNGKey(3), strong, weak,
        method=WSRCNN.train_losses,
    )
    losses_j = {k: float(v) for k, v in losses_j.items()}

    # ------------------- torch assembly of the reference train step ----------
    tm = TorchResNetC4(depth=depth).eval()
    set_conv(tm.stem.conv1, params["backbone"]["stem_conv1"]["kernel"])
    set_bn(tm.stem.conv1.norm, params["backbone"]["stem_conv1_bn"])
    for s in (2, 3, 4):
        copy_stage(getattr(tm, f"res{s}"), params["backbone"][f"res{s}"])
    copy_stage(tm.res5, params["box_head"]["res5"])
    tm_weak = TorchResNetC4(depth=depth).eval()
    copy_stage(tm_weak.res5, params["weak_box_head"]["res5"])

    rp = params["rpn_head"]
    A = mc.rpn.num_cell_anchors
    conv_rpn = torch.nn.Conv2d(1024, 1024, 3, padding=1)
    conv_obj = torch.nn.Conv2d(1024, A, 1)
    conv_del = torch.nn.Conv2d(1024, A * 4, 1)
    with torch.no_grad():
        conv_rpn.weight.copy_(t(rp["conv"]["kernel"]).permute(3, 2, 0, 1))
        conv_rpn.bias.copy_(t(rp["conv"]["bias"]))
        conv_obj.weight.copy_(t(rp["objectness_logits"]["kernel"]).permute(3, 2, 0, 1))
        conv_obj.bias.copy_(t(rp["objectness_logits"]["bias"]))
        conv_del.weight.copy_(t(rp["anchor_deltas"]["kernel"]).permute(3, 2, 0, 1))
        conv_del.bias.copy_(t(rp["anchor_deltas"]["bias"]))

    lin_cls_delta = make_linear(params["supervised"]["cls_score_delta"])
    lin_bbox_delta = make_linear(params["supervised"]["bbox_pred_delta"])
    lin_oicr = [
        make_linear(params["weak_detector"][f"oicr_predictor_{i}"]) for i in range(3)
    ]
    lin_mil_cls = make_linear(params["weak_detector"]["classifier_stream"])
    lin_mil_det = make_linear(params["weak_detector"]["detection_stream"])

    with torch.no_grad():
        x = torch.as_tensor(np.concatenate([s_images, w_images], 0)).permute(0, 3, 1, 2)
        x = x - torch.tensor(PIXEL_MEAN).view(1, 3, 1, 1)
        feats = tm.forward_c4(x)
        fh, fw = feats.shape[2], feats.shape[3]
        tr = F.relu(conv_rpn(feats))
        logits = conv_obj(tr).permute(0, 2, 3, 1).reshape(2 * B, -1).numpy()
        deltas = conv_del(tr).permute(0, 2, 3, 1).reshape(2 * B, fh * fw * A, 4).numpy()
    anchors = np_anchors(fh, fw)
    n_anchors = anchors.shape[0]
    assert n_anchors < RPN_BSPI, "config must keep every anchor"

    # --- RPN losses over the strong batch (d2 rpn.py losses) ---
    rpn_obj_sum, rpn_loc_sum = 0.0, 0.0
    for i in range(B):
        gtv = gt_boxes[i][gt_valid[i]]
        iou = np_pairwise_iou(gtv, anchors)
        matches, lab, _ = np_match(iou, (0.3, 0.7), (0, -1, 1), True)
        pos, neg = lab == 1, lab == 0
        lg = logits[i]
        # stable BCE with {0,1} targets over the (complete) sampled set
        bce = np.maximum(lg, 0) - lg * pos + np.log1p(np.exp(-np.abs(lg)))
        rpn_obj_sum += float(bce[pos | neg].sum())
        gtd = np_get_deltas(anchors[pos], gtv[matches[pos]])
        rpn_loc_sum += float(np.abs(deltas[i][pos] - gtd).sum())
    rpn_norm = B * RPN_BSPI
    losses_t = {
        "loss_rpn_cls": rpn_obj_sum / rpn_norm,
        "loss_rpn_loc": rpn_loc_sum / rpn_norm,
    }

    # --- supervised Fast-RCNN losses (fast_rcnn.py:384-453) ---
    ce_sum, box_sum, n_total = 0.0, 0.0, 0
    for i in range(B):
        pb, _ = np_select_proposals(logits[i], deltas[i], anchors, (H, W),
                                    post_k=POST_K)
        gtv = gt_boxes[i][gt_valid[i]]
        cand = np.concatenate([pb, gtv], 0)  # PROPOSAL_APPEND_GT
        assert cand.shape[0] < ROI_BATCH, "config must keep every candidate"
        iou = np_pairwise_iou(gtv, cand)
        matches, lab, _ = np_match(iou, (0.5,), (0, 1), False)
        cls_i = np.where(lab == 1, gt_classes[i][gt_valid[i]][matches], C)

        with torch.no_grad():
            fmap = feats[i].permute(1, 2, 0)
            pooled = torch_roi_align_v2(fmap, cand).permute(0, 3, 1, 2)
            box_feats = tm.res5(pooled).mean(dim=(2, 3))
            weak_feats = tm_weak.res5(pooled).mean(dim=(2, 3))
            delta_scores = lin_cls_delta(box_feats).numpy()
            proposal_deltas = lin_bbox_delta(box_feats).numpy()
            weak_eval = torch.stack([l(weak_feats) for l in lin_oicr]).mean(0).numpy()

        scores = delta_scores + weak_eval
        scores[:, list(NOVEL_IDS)] = NEG_INF  # base training novel mask
        logp = scores - scores.max(-1, keepdims=True)
        logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
        ce_sum += float(-logp[np.arange(len(cls_i)), cls_i].sum())

        fg = cls_i < C
        gt_d = np_get_deltas(cand[fg], gtv[matches[fg]], (10.0, 10.0, 5.0, 5.0))
        sel = proposal_deltas.reshape(-1, C, 4)[fg, cls_i[fg]]
        box_sum += float(np.abs(sel - gt_d).sum())
        n_total += len(cls_i)
    losses_t["loss_cls"] = ce_sum / n_total
    losses_t["loss_box_reg"] = box_sum / n_total

    # --- weak MIL + OICR losses (weak_detector_fast_rcnn.py:189-243) ---
    bce_terms = []
    oicr_terms = {k: [] for k in range(3)}
    for i in range(B):
        j = B + i  # weak images sit after the strong ones in the fused batch
        pb, _ = np_select_proposals(logits[j], deltas[j], anchors, (H, W),
                                    post_k=POST_K)
        pb = pb[:WEAK_P]
        with torch.no_grad():
            fmap = feats[j].permute(1, 2, 0)
            pooled = torch_roi_align_v2(fmap, pb).permute(0, 3, 1, 2)
            wf = tm_weak.res5(pooled).mean(dim=(2, 3))
            cls_lg = lin_mil_cls(wf).numpy()
            det_lg = lin_mil_det(wf).numpy()
            oicr_lg = [l(wf).numpy() for l in lin_oicr]

        x_r, class_vec = np_mil(cls_lg, det_lg)
        lab = w_labels[i]
        bce_terms.append(-(lab * np.log(class_vec) + (1 - lab) * np.log(1 - class_vec)))

        prev = x_r
        for k in range(3):
            t_labels, t_weights = np_mine_and_label(prev, pb, w_labels[i])
            oicr_terms[k].append(np_weighted_ce(oicr_lg[k], t_labels, t_weights))
            prev = np_softmax(oicr_lg[k], -1)
    losses_t["loss_im_cls"] = float(np.mean(np.stack(bce_terms)))
    for k in range(3):
        losses_t[f"loss_oicr_{k + 1}"] = float(np.mean(oicr_terms[k]))

    # ------------------- compare every loss term ------------------------------
    assert set(losses_t) == set(losses_j), (
        f"loss keys differ: ours {sorted(losses_j)} vs torch {sorted(losses_t)}"
    )
    # measured agreement is ~1e-7 relative (both stacks are fp32 end-to-end);
    # rtol 1e-5 leaves two orders of headroom while catching any semantic drift
    for k in sorted(losses_t):
        np.testing.assert_allclose(
            losses_j[k], losses_t[k], rtol=1e-5, atol=1e-7,
            err_msg=f"loss term {k}: ours {losses_j[k]} vs torch {losses_t[k]}",
        )
    # sanity: terms are non-degenerate
    assert losses_t["loss_im_cls"] > 0.01
    assert losses_t["loss_oicr_1"] > 0.0
    assert losses_t["loss_rpn_cls"] > 0.0
