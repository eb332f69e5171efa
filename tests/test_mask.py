"""Mask head: crop/resample, loss, transfer, and full mask-on model smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models import mask_head as M
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch
from unit_tpu.models import WSRCNN
from unit_tpu.models.similarity import SimilarityConfig, coco_indexer_for, VOC_CLASSES


def test_crop_mask_identity():
    m = np.zeros((8, 8), np.float32)
    m[2:6, 2:6] = 1.0
    out = M.crop_mask_to_box(
        jnp.asarray(m), jnp.asarray([0.0, 0.0, 8.0, 8.0]),
        jnp.asarray([0.0, 0.0, 8.0, 8.0]), 8,
    )
    np.testing.assert_allclose(np.asarray(out), m, atol=0.3)


def test_crop_mask_subregion():
    m = np.zeros((16, 16), np.float32)
    m[:, 8:] = 1.0  # right half on
    # crop the right half of the gt box -> all ones
    out = M.crop_mask_to_box(
        jnp.asarray(m), jnp.asarray([0.0, 0.0, 32.0, 32.0]),
        jnp.asarray([16.0, 0.0, 32.0, 32.0]), 4,
    )
    assert np.asarray(out).mean() > 0.9


def test_transfer_mask_logits_2d():
    n, h, w, c = 2, 4, 4, 6
    base_ids = np.asarray([0, 1, 2, 3])
    novel_ids = np.asarray([4, 5])
    logits = jnp.asarray(np.random.RandomState(0).randn(n, h, w, c).astype(np.float32))
    sim = jnp.asarray([[1.0, 0, 0, 0], [0, 0, 0, 1.0]])
    out = M.transfer_mask_logits(logits, sim, base_ids, novel_ids)
    np.testing.assert_allclose(np.asarray(out[..., 4]), np.asarray(logits[..., 0]))
    np.testing.assert_allclose(np.asarray(out[..., 5]), np.asarray(logits[..., 3]))
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(logits[..., 0]))


def test_mask_loss_finite(rng):
    n, m, c = 4, 8, 5
    logits = jnp.asarray(rng.randn(n, m, m, c).astype(np.float32))
    classes = jnp.asarray([0, 1, 2, 0])
    gt_masks = jnp.asarray(rng.rand(n, 16, 16).astype(np.float32))
    gt_boxes = jnp.asarray([[0, 0, 20, 20]] * n, jnp.float32)
    rois = jnp.asarray([[2, 2, 18, 18]] * n, jnp.float32)
    fg = jnp.asarray([True, True, False, True])
    loss = M.mask_rcnn_loss(logits, classes, gt_masks, gt_boxes, rois, fg)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda l: M.mask_rcnn_loss(l, classes, gt_masks, gt_boxes, rois, fg)
    )(logits)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_mask_on_model_end_to_end():
    base_ids = tuple(i for i in range(20) if i not in (2, 5, 9, 13, 17))
    novel_ids = (2, 5, 9, 13, 17)
    sim = SimilarityConfig(
        terms=(
            ("cls", ("lingual",)), ("bbox", ("lingual",)), ("seg", ("lingual",)),
        ),
        base_ids=base_ids, novel_ids=novel_ids,
        coco_indexer=tuple(coco_indexer_for(VOC_CLASSES)),
    )
    mc = tiny_config(mask_on=True, mask_fg_slots=8, sim=sim)
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    assert "mask_head" in variables["params"]

    strong = _strong_batch()
    strong["gt_masks"] = jnp.asarray(
        np.random.RandomState(3).rand(1, 4, 16, 16).astype(np.float32) > 0.5,
        jnp.float32,
    )
    losses = model.apply(
        variables, jax.random.PRNGKey(1), strong, _weak_batch(),
        method=WSRCNN.train_losses,
    )
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(variables, imgs, sizes, method=WSRCNN.predict)
    assert det.masks is not None
    assert det.masks.shape[:2] == det.boxes.shape[:2]
    assert np.isfinite(np.asarray(det.masks)).all()


@pytest.mark.slow
def test_mask_finetune_head_end_to_end():
    """WSROIHeadWithMaskFineTune path: predictor_delta + train-time transfer."""
    base_ids = tuple(i for i in range(20) if i not in (2, 5, 9, 13, 17))
    novel_ids = (2, 5, 9, 13, 17)
    sim = SimilarityConfig(
        terms=(
            ("cls", ("lingual",)), ("bbox", ("lingual",)), ("seg", ("lingual",)),
        ),
        base_ids=base_ids, novel_ids=novel_ids,
        coco_indexer=tuple(coco_indexer_for(VOC_CLASSES)),
    )
    mc = tiny_config(mask_on=True, mask_fg_slots=8, mask_head_finetune=True,
                     finetune=True, sim=sim)
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    assert "predictor_delta" in variables["params"]["mask_head"]

    strong = _strong_batch()
    strong["gt_masks"] = jnp.asarray(
        np.random.RandomState(3).rand(1, 4, 16, 16).astype(np.float32) > 0.5,
        jnp.float32,
    )
    losses = model.apply(
        variables, jax.random.PRNGKey(1), strong, None,
        method=WSRCNN.train_losses,
    )
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
