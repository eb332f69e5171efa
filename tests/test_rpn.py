"""RPN unit tests: anchors, labeling, proposal selection, loss values."""

import jax
import jax.numpy as jnp
import numpy as np

from unit_tpu.models import rpn as R
from unit_tpu.structures.instances import GTInstances
from unit_tpu.ops import anchors as anchor_ops


def _cfg(**kw):
    d = dict(
        sizes=(32, 64), aspect_ratios=(0.5, 1.0, 2.0),
        pre_nms_topk_train=64, post_nms_topk_train=16,
        pre_nms_topk_test=64, post_nms_topk_test=16,
        batch_size_per_image=32,
    )
    d.update(kw)
    return R.RPNConfig(**d)


def test_cell_anchors_area_and_ratio():
    a = anchor_ops.cell_anchors([32], [0.5, 1.0, 2.0])
    for i, ar in enumerate([0.5, 1.0, 2.0]):
        w = a[i, 2] - a[i, 0]
        h = a[i, 3] - a[i, 1]
        assert abs(w * h - 32 * 32) < 1e-3       # area preserved
        assert abs(h / w - ar) < 1e-5            # aspect ratio
        np.testing.assert_allclose(a[i, :2], -a[i, 2:], atol=1e-5)  # centered


def test_grid_anchor_layout():
    g = np.asarray(anchor_ops.grid_anchors(2, 3, 16, [32], [1.0]))
    assert g.shape == (6, 4)
    # row-major (y, x): anchor 1 is at x=16, y=0
    np.testing.assert_allclose(g[1] - g[0], [16, 0, 16, 0])
    np.testing.assert_allclose(g[3] - g[0], [0, 16, 0, 16])


def test_label_anchors_caps_positives():
    cfg = _cfg(batch_size_per_image=8, positive_fraction=0.5)
    anchors = anchor_ops.grid_anchors(4, 4, 16, cfg.sizes, cfg.aspect_ratios)
    gt = GTInstances(
        boxes=jnp.asarray([[8.0, 8.0, 40.0, 40.0]]),
        classes=jnp.asarray([0]),
        valid=jnp.asarray([True]),
    )
    labels, matched = R.label_anchors(jax.random.PRNGKey(0), anchors, gt, cfg)
    labels = np.asarray(labels)
    assert (labels == 1).sum() <= 4
    assert (labels >= 0).sum() <= 8
    # matched boxes equal the single gt wherever fg
    m = np.asarray(matched)[labels == 1]
    if len(m):
        np.testing.assert_allclose(m, [[8, 8, 40, 40]] * len(m))


def test_rpn_loss_values_manual():
    """2 anchors, hand-computed BCE + L1."""
    cfg = _cfg(batch_size_per_image=2, positive_fraction=0.5, iou_thresholds=(0.3, 0.5))
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 110.0, 110.0]])
    gt = GTInstances(
        boxes=jnp.asarray([[[0.0, 0.0, 10.0, 10.0]]]),
        classes=jnp.asarray([[0]]),
        valid=jnp.asarray([[True]]),
    )
    logits = jnp.asarray([[2.0, -1.0]])
    deltas = jnp.zeros((1, 2, 4))
    losses = R.rpn_losses(jax.random.PRNGKey(0), logits, deltas, anchors, gt, cfg)
    # anchor0: perfect match (IoU 1) -> label 1; anchor1: IoU 0 -> label 0
    want_obj = (np.log1p(np.exp(-2.0)) + np.log1p(np.exp(-1.0))) / 2.0
    assert abs(float(losses["loss_rpn_cls"]) - want_obj) < 1e-5
    # deltas exactly zero and target deltas zero -> zero loc loss
    assert abs(float(losses["loss_rpn_loc"])) < 1e-6


def test_select_proposals_sorted_and_clipped():
    cfg = _cfg()
    fh = fw = 4
    anchors = R.get_anchors(fh, fw, cfg)
    n = anchors.shape[0]
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, n).astype(np.float32))
    deltas = jnp.zeros((1, n, 4))
    props = R.select_proposals(
        logits, deltas, anchors, jnp.asarray([[64.0, 64.0]]), cfg, training=False
    )
    assert props.boxes.shape == (1, 16, 4)
    obj = np.asarray(props.objectness[0])[np.asarray(props.valid[0])]
    assert np.all(np.diff(obj) <= 1e-6)  # sorted by objectness
    b = np.asarray(props.boxes[0])
    assert b.min() >= 0 and b.max() <= 64  # clipped to image
