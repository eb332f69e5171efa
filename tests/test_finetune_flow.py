"""k-shot fine-tuning flow: FT heads train, frozen branches stay fixed."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unit_tpu.config import get_cfg
from unit_tpu.engine import TrainerFineTune, create_train_state, make_train_step
from unit_tpu.models import WSRCNN
from unit_tpu.solver import build_optimizer
from tests.test_model_smoke import tiny_config, _strong_batch


def _ft_cfg():
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    # the reference FT freeze lists (configs/VOC/FT/10_shot/...-ft.yaml:6-9)
    cfg.MODEL.FREEZE_LAYERS.META_ARCH = ["backbone"]
    cfg.MODEL.FREEZE_LAYERS.ROI_HEADS = ["box_pooler", "box_head", "weak_box_head"]
    cfg.MODEL.FREEZE_LAYERS.FAST_RCNN = [
        "weak_detector_head", "cls_score_delta", "bbox_pred_delta", "embeddings"
    ]
    return cfg


@pytest.mark.slow
def test_finetune_only_ft_heads_update():
    mc = tiny_config(finetune=True)
    model = WSRCNN(mc=mc)
    cfg = _ft_cfg()

    state0 = create_train_state(model, optax.sgd(0.0), jax.random.PRNGKey(0))
    optimizer = build_optimizer(cfg, state0.params)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer)

    strong = _strong_batch()
    # the step donates its input state; snapshot params to host first
    params_before = jax.device_get(state.params)
    new_state, metrics = step(state, strong, None, None, jax.random.PRNGKey(1))
    assert np.isfinite(metrics["total_loss"])

    def leaf(params, path):
        node = params
        for p in path:
            node = node[p]
        return np.asarray(node)

    frozen_paths = [
        ("backbone", "res3", "block0", "conv1", "kernel"),
        ("supervised", "cls_score_delta", "kernel"),
        ("weak_detector", "classifier_stream", "kernel"),
        ("box_head", "res5", "block0", "conv1", "kernel"),
    ]
    for path in frozen_paths:
        np.testing.assert_allclose(
            leaf(params_before, path), leaf(new_state.params, path),
            err_msg=f"frozen {path} changed",
        )
    # ft heads receive updates (bias always has gradient through CE)
    ft_b0 = leaf(params_before, ("supervised", "cls_score_ft", "bias"))
    ft_b1 = leaf(new_state.params, ("supervised", "cls_score_ft", "bias"))
    assert not np.allclose(ft_b0, ft_b1), "ft head did not update"
