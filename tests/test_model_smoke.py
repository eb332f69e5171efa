"""End-to-end smoke tests: init a tiny model, run a train step and inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models import ModelConfig, WSRCNN
from unit_tpu.models import rpn as rpn_lib
from unit_tpu.models import fast_rcnn as frcnn_lib
from unit_tpu.models import weak_losses as weak_lib
from unit_tpu.models import similarity as sim_lib


def tiny_config(**kw):
    base_ids = tuple(i for i in range(20) if i not in (2, 5, 9, 13, 17))
    novel_ids = (2, 5, 9, 13, 17)
    defaults = dict(
        depth=26,
        num_classes=20,
        base_ids=base_ids,
        novel_ids=novel_ids,
        multi_box_head=True,
        pooler_resolution=7,
        roi_batch_size=32,
        weak_proposal_count=32,
        oicr_iter=2,
        rpn=rpn_lib.RPNConfig(
            pre_nms_topk_train=200, pre_nms_topk_test=200,
            post_nms_topk_train=64, post_nms_topk_test=64,
        ),
        frcnn=frcnn_lib.FastRCNNConfig(num_classes=20, topk_per_image=20),
        weak=weak_lib.WeakLossConfig(num_classes=20, oicr_iter=2),
        sim=sim_lib.SimilarityConfig(
            terms=(("cls", ("lingual", "visual")), ("bbox", ("lingual", "visual"))),
            base_ids=base_ids,
            novel_ids=novel_ids,
            coco_indexer=tuple(sim_lib.coco_indexer_for(sim_lib.VOC_CLASSES)),
        ),
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


@pytest.fixture(scope="module")
def model_and_vars():
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    return model, variables


def _strong_batch(b=1, h=64, w=64, g=4):
    rng = np.random.RandomState(1)
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[..., :2] = rng.rand(b, g, 2) * 20
    boxes[..., 2:] = boxes[..., :2] + 10 + rng.rand(b, g, 2) * 20
    return {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 15, (b, g)).astype(np.int32)),
        "gt_valid": jnp.asarray(np.array([[True, True, True, False]] * b)),
        "image_size": jnp.asarray([[h, w]] * b, jnp.float32),
    }


def _weak_batch(b=1, h=64, w=64, c=20):
    rng = np.random.RandomState(2)
    labels = np.zeros((b, c), np.float32)
    labels[:, [1, 7]] = 1.0
    return {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255),
        "labels": jnp.asarray(labels),
        "image_size": jnp.asarray([[h, w]] * b, jnp.float32),
    }


def test_param_count_sane(model_and_vars):
    _, variables = model_and_vars
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n > 1e6  # tiny resnet + heads


def test_train_losses_finite(model_and_vars):
    model, variables = model_and_vars
    losses = model.apply(
        variables, jax.random.PRNGKey(3), _strong_batch(), _weak_batch(),
        method=WSRCNN.train_losses,
    )
    expected = {
        "loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
        "loss_im_cls", "loss_oicr_1", "loss_oicr_2",
    }
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


@pytest.mark.slow
def test_train_losses_grads_flow(model_and_vars):
    model, variables = model_and_vars

    def total(params):
        losses = model.apply(
            {"params": params}, jax.random.PRNGKey(3), _strong_batch(), _weak_batch(),
            method=WSRCNN.train_losses,
        )
        return sum(jax.tree.leaves(losses))

    grads = jax.grad(total)(variables["params"])
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(flat))
    # weak streams and backbone both get gradient
    wd = grads["weak_detector"]["classifier_stream"]["kernel"]
    assert float(jnp.abs(wd).sum()) > 0
    bb = grads["backbone"]["res2"]["block0"]["conv1"]["kernel"]
    assert float(jnp.abs(bb).sum()) > 0
    # frozen BN stats always get zero-like grads path (masked later by solver)


@pytest.mark.slow
def test_predict_shapes(model_and_vars):
    model, variables = model_and_vars
    imgs = jnp.asarray(np.random.RandomState(5).rand(2, 64, 64, 3).astype(np.float32))
    sizes = jnp.asarray([[64, 64], [60, 48]], jnp.float32)
    det = model.apply(variables, imgs, sizes, method=WSRCNN.predict)
    assert det.boxes.shape == (2, 20, 4)
    assert det.scores.shape == (2, 20)
    assert det.classes.shape == (2, 20)
    assert np.isfinite(np.asarray(det.boxes)).all()


def test_train_only_weak(model_and_vars):
    model, variables = model_and_vars
    losses = model.apply(
        variables, jax.random.PRNGKey(3), None, _weak_batch(),
        train_only_weak=True, method=WSRCNN.train_losses,
    )
    assert "loss_im_cls" in losses and "loss_cls" not in losses
