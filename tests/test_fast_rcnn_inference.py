"""fast_rcnn_inference semantics: thresholds, per-class NMS, top-k, clipping."""

import numpy as np
import jax.numpy as jnp

from unit_tpu.models.fast_rcnn import FastRCNNConfig, fast_rcnn_inference_single


def _identity_deltas(p, c):
    return jnp.zeros((p, c * 4))


def test_threshold_filters_low_scores():
    cfg = FastRCNNConfig(num_classes=2, score_thresh=0.5, topk_per_image=10)
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0], [50.0, 50.0, 70.0, 70.0]])
    probs = jnp.asarray([[0.8, 0.1, 0.1], [0.3, 0.3, 0.4]])
    det = fast_rcnn_inference_single(
        probs, _identity_deltas(2, 2), boxes, jnp.ones(2, bool), (100, 100), cfg
    )
    valid = np.asarray(det.valid)
    assert valid.sum() == 1
    assert int(np.asarray(det.classes)[valid][0]) == 0
    assert abs(float(np.asarray(det.scores)[valid][0]) - 0.8) < 1e-6


def test_per_class_nms_keeps_cross_class_overlaps():
    cfg = FastRCNNConfig(num_classes=2, score_thresh=0.05, topk_per_image=10)
    # same box, high prob in different classes for the two proposals
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0], [10.0, 10.0, 30.0, 30.0]])
    probs = jnp.asarray([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05]])
    det = fast_rcnn_inference_single(
        probs, _identity_deltas(2, 2), boxes, jnp.ones(2, bool), (100, 100), cfg
    )
    valid = np.asarray(det.valid)
    assert valid.sum() == 2  # different classes both survive
    assert set(np.asarray(det.classes)[valid]) == {0, 1}


def test_same_class_duplicates_suppressed():
    cfg = FastRCNNConfig(num_classes=1, score_thresh=0.05, topk_per_image=10)
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0], [11.0, 11.0, 31.0, 31.0]])
    probs = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
    det = fast_rcnn_inference_single(
        probs, _identity_deltas(2, 1), boxes, jnp.ones(2, bool), (100, 100), cfg
    )
    assert np.asarray(det.valid).sum() == 1


def test_invalid_proposals_excluded():
    cfg = FastRCNNConfig(num_classes=1, score_thresh=0.05, topk_per_image=10)
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0], [50.0, 50.0, 70.0, 70.0]])
    probs = jnp.asarray([[0.9, 0.1], [0.9, 0.1]])
    det = fast_rcnn_inference_single(
        probs, _identity_deltas(2, 1), boxes,
        jnp.asarray([True, False]), (100, 100), cfg,
    )
    valid = np.asarray(det.valid)
    assert valid.sum() == 1
    np.testing.assert_allclose(np.asarray(det.boxes)[valid][0], [10, 10, 30, 30])


def test_boxes_clipped_to_image():
    cfg = FastRCNNConfig(num_classes=1, score_thresh=0.05, topk_per_image=5)
    boxes = jnp.asarray([[-20.0, -20.0, 150.0, 150.0]])
    probs = jnp.asarray([[0.9, 0.1]])
    det = fast_rcnn_inference_single(
        probs, _identity_deltas(1, 1), boxes, jnp.ones(1, bool), (60, 80), cfg
    )
    b = np.asarray(det.boxes)[np.asarray(det.valid)][0]
    assert b[0] >= 0 and b[1] >= 0 and b[2] <= 80 and b[3] <= 60
