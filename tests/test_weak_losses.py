"""Golden tests of the MIL/OICR losses against a direct NumPy transcription of the
reference semantics (weak_detector_fast_rcnn.py:189-255,353-408)."""

import numpy as np
import pytest
import jax.numpy as jnp

from unit_tpu.models import weak_losses as W
from tests.test_boxes import random_boxes


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_mil(cls_logits, det_logits, labels, eps=1e-6):
    """Reference MIL loss for a single image, all proposals valid."""
    x_r = _np_softmax(cls_logits, -1) * _np_softmax(det_logits, 0)
    class_vec = x_r.sum(0)
    p = np.clip(class_vec, eps, 1 - eps)
    bce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    return x_r, float(bce.mean())


def _np_iou_single(a, b):
    xa, ya = np.maximum(a[:2], b[:2]), None
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    aa = (a[2] - a[0]) * (a[3] - a[1])
    ab = (b[2] - b[0]) * (b[3] - b[1])
    u = aa + ab - inter
    return inter / u if u > 0 else 0.0


def _np_oicr_targets(prev_scores, boxes, labels, num_classes, fg_thr=0.5, bg_thr=0.1):
    """Reference pseudo-GT mining + proposal labeling for one image."""
    s = prev_scores[:, :num_classes].copy()
    gt_boxes, gt_scores, gt_classes = [], [], []
    for c in range(num_classes):
        if labels[c] <= 0.5:
            continue
        idx = int(np.argmax(s[:, c]))
        gt_boxes.append(boxes[idx].copy())
        gt_scores.append(s[idx, c])
        gt_classes.append(c)
        s[idx, :] = 0.0
    gt_boxes = np.asarray(gt_boxes)
    p = len(boxes)
    out_labels = np.full(p, num_classes, np.int64)
    out_weights = np.zeros(p)
    for i in range(p):
        ious = [_np_iou_single(g, boxes[i]) for g in gt_boxes]
        j = int(np.argmax(ious))
        out_weights[i] = gt_scores[j]
        if ious[j] >= fg_thr:
            out_labels[i] = gt_classes[j]
        if ious[j] < bg_thr:
            out_weights[i] = 0.0
    return out_labels, out_weights


def test_mil_loss_matches_reference(rng):
    p, c = 30, 20
    cls_logits = rng.randn(1, p, c).astype(np.float32)
    det_logits = rng.randn(1, p, c).astype(np.float32)
    labels = np.zeros((1, c), np.float32)
    labels[0, [3, 7, 12]] = 1.0
    valid = np.ones((1, p), bool)

    import jax

    mil_scores, class_vecs = jax.vmap(W.mil_image_scores)(
        jnp.asarray(cls_logits), jnp.asarray(det_logits), jnp.asarray(valid)
    )
    loss = W.binary_cross_entropy(class_vecs, jnp.asarray(labels))
    want_xr, want_loss = _np_mil(cls_logits[0], det_logits[0], labels[0])
    np.testing.assert_allclose(np.asarray(mil_scores[0]), want_xr, atol=1e-5)
    assert abs(float(loss) - want_loss) < 1e-5


def test_mil_invalid_proposals_excluded(rng):
    p, c = 16, 5
    cls_logits = rng.randn(p, c).astype(np.float32)
    det_logits = rng.randn(p, c).astype(np.float32)
    valid = np.arange(p) < 10
    got_xr, got_vec = W.mil_image_scores(
        jnp.asarray(cls_logits), jnp.asarray(det_logits), jnp.asarray(valid)
    )
    want_xr, _ = _np_mil(cls_logits[:10], det_logits[:10], np.zeros(c))
    np.testing.assert_allclose(np.asarray(got_xr[:10]), want_xr, atol=1e-5)
    assert np.all(np.asarray(got_xr[10:]) == 0)


def test_pseudo_gt_mining_matches_reference(rng):
    p, c = 40, 20
    boxes = random_boxes(rng, p, size=80.0)
    scores = rng.rand(p, c + 1).astype(np.float32)
    labels = np.zeros(c, np.float32)
    labels[[2, 5, 11]] = 1.0
    valid = np.ones(p, bool)

    pseudo = W.mine_pseudo_gt(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(valid),
        jnp.asarray(labels), c,
    )
    cfg = W.WeakLossConfig(num_classes=c)
    t_labels, t_weights, _, _ = W.oicr_targets(
        pseudo, jnp.asarray(boxes), jnp.asarray(valid), cfg
    )
    want_labels, want_weights = _np_oicr_targets(scores, boxes, labels, c)
    np.testing.assert_array_equal(np.asarray(t_labels), want_labels)
    np.testing.assert_allclose(np.asarray(t_weights), want_weights, atol=1e-5)


@pytest.mark.slow
def test_full_weak_losses_finite(rng):
    b, p, c = 2, 24, 20
    streams = {
        "classifier_stream": jnp.asarray(rng.randn(b * p, c).astype(np.float32)),
        "detection_stream": jnp.asarray(rng.randn(b * p, c).astype(np.float32)),
        "oicr_scores": [
            jnp.asarray(rng.randn(b * p, c + 1).astype(np.float32)) for _ in range(3)
        ],
        "oicr_bbox": [],
        "regression_cls": None,
        "regression_bbox": None,
    }
    proposals = jnp.asarray(np.stack([random_boxes(rng, p) for _ in range(b)]))
    valid = jnp.ones((b, p), bool)
    labels = np.zeros((b, c), np.float32)
    labels[:, [0, 4]] = 1.0
    cfg = W.WeakLossConfig(num_classes=c, oicr_iter=3)
    losses = W.weak_detector_losses(streams, proposals, valid, jnp.asarray(labels), cfg)
    assert set(losses) == {"loss_im_cls", "loss_oicr_1", "loss_oicr_2", "loss_oicr_3"}
    for v in losses.values():
        assert np.isfinite(float(v))


def test_pseudo_gt_sequential_row_zeroing():
    """Reference semantics: once a proposal is chosen for a class, its score row
    is zeroed so the next class picks a different proposal (ref :364)."""
    import jax.numpy as jnp

    boxes = np.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]], np.float32
    )
    # proposal 0 has the max score for BOTH class 0 and class 1
    scores = np.asarray(
        [[0.9, 0.8], [0.5, 0.6], [0.1, 0.2]], np.float32
    )
    labels = np.asarray([1.0, 1.0], np.float32)
    pseudo = W.mine_pseudo_gt(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.ones(3, bool),
        jnp.asarray(labels), 2,
    )
    b = np.asarray(pseudo.boxes)
    np.testing.assert_allclose(b[0], boxes[0])  # class 0 takes proposal 0
    np.testing.assert_allclose(b[1], boxes[1])  # class 1 must take proposal 1
    np.testing.assert_allclose(np.asarray(pseudo.scores), [0.9, 0.6], atol=1e-6)
