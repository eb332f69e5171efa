import jax
import jax.numpy as jnp
import numpy as np

from unit_tpu.config import get_cfg
from unit_tpu.solver import build_optimizer, warmup_multistep
from unit_tpu.solver.build import is_frozen, lr_factor_for


def test_warmup_multistep_schedule():
    sched = warmup_multistep(0.02, (12000, 24000), 0.1, 1 / 1000, 100)
    assert abs(float(sched(0)) - 0.02 * (1 / 1000)) < 1e-9
    assert abs(float(sched(100)) - 0.02) < 1e-9
    assert abs(float(sched(11999)) - 0.02) < 1e-9
    assert abs(float(sched(12000)) - 0.002) < 1e-9
    assert abs(float(sched(24000)) - 0.0002) < 1e-10


def test_freeze_rules():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 2
    assert is_frozen("backbone/stem_conv1/kernel", cfg)
    assert is_frozen("backbone/res2/block0/conv1/kernel", cfg)
    assert not is_frozen("backbone/res3/block0/conv1/kernel", cfg)
    assert is_frozen("backbone/res3/block0/conv1_bn/weight", cfg)  # frozen BN
    assert is_frozen("embeddings", cfg)
    assert not is_frozen("supervised/cls_score_delta/kernel", cfg)
    cfg.MODEL.FREEZE_LAYERS.FAST_RCNN = ["classifier_stream", "detection_stream"]
    assert is_frozen("weak_detector/classifier_stream/kernel", cfg)


def test_lr_factors():
    cfg = get_cfg()
    cfg.SOLVER.REFINEMENT_LR_FACTOR = 0.1
    cfg.SOLVER.MIL_LR_FACTOR = 2.0
    cfg.SOLVER.DELTA_LR_FACTOR = 0.5
    assert lr_factor_for("weak_detector/oicr_predictor_0/kernel", cfg) == 0.1
    assert lr_factor_for("weak_detector/classifier_stream/kernel", cfg) == 2.0
    assert lr_factor_for("supervised/cls_score_delta/kernel", cfg) == 0.5
    assert lr_factor_for("backbone/res3/block0/conv1/kernel", cfg) == 1.0


def test_optimizer_freezes_and_updates():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    params = {
        "backbone": {"res2": {"block0": {"conv1": {"kernel": jnp.ones((3,))}}}},
        "supervised": {"cls_score_delta": {"kernel": jnp.ones((3,))}},
    }
    opt = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    frozen_upd = updates["backbone"]["res2"]["block0"]["conv1"]["kernel"]
    live_upd = updates["supervised"]["cls_score_delta"]["kernel"]
    assert float(jnp.abs(frozen_upd).sum()) == 0.0
    assert float(jnp.abs(live_upd).sum()) > 0.0


def test_frozen_params_receive_exactly_zero_updates():
    """Freezing must zero the UPDATE (and keep momentum at zero) so XLA can
    prune the frozen backward — regression for the round-2 change that moved
    freezing from a final LR factor to masked set_to_zero before the trace."""
    import jax
    import jax.numpy as jnp

    from unit_tpu.config import get_cfg
    from unit_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 2
    # path_str uses '/'-joined keys; mirror the real tree layout
    params = {
        "backbone": {
            "stem": {"conv1": {"kernel": jnp.ones((3, 3))}},
            "res2": {"b0": {"kernel": jnp.ones((3, 3))}},
            "res4": {"b0": {"kernel": jnp.ones((3, 3))}},
        }
    }
    opt = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state2 = opt.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["stem"]["conv1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["res2"]["b0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["res4"]["b0"]["kernel"]).max()) > 0.0
    # second step: frozen momentum stays identically zero
    updates2, _ = opt.update(grads, state2, params)
    assert float(jnp.abs(updates2["backbone"]["res2"]["b0"]["kernel"]).max()) == 0.0


def test_weight_decay_bias_applied():
    """Reference semantics: biases decay with SOLVER.WEIGHT_DECAY_BIAS, other
    weights with SOLVER.WEIGHT_DECAY (solver/build.py:92-101 + d2 SGD groups)."""
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.5
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.25
    params = {"supervised": {"cls_score": {"kernel": jnp.ones((2,)),
                                           "bias": jnp.ones((2,))}}}
    opt = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)  # isolate the decay term
    updates, _ = opt.update(grads, state, params)
    # update = -lr * wd * param
    k = float(updates["supervised"]["cls_score"]["kernel"][0])
    b = float(updates["supervised"]["cls_score"]["bias"][0])
    assert abs(k + 0.5) < 1e-6, k
    assert abs(b + 0.25) < 1e-6, b
    # WEIGHT_DECAY_BIAS = 0 switches bias decay off entirely
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    opt0 = build_optimizer(cfg, params)
    updates0, _ = opt0.update(grads, opt0.init(params), params)
    assert float(jnp.abs(updates0["supervised"]["cls_score"]["bias"]).max()) == 0.0


def test_auto_scale_workers():
    """SOLVER.REFERENCE_WORLD_SIZE linear-scaling rule (reference README.md:51
    -> d2 DefaultTrainer.auto_scale_workers)."""
    from unit_tpu.engine.runner import auto_scale_workers

    cfg = get_cfg()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 4
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.MAX_ITER = 30000
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.STEPS = (12000, 24000)
    cfg.TEST.EVAL_PERIOD = 5000
    cfg.SOLVER.CHECKPOINT_PERIOD = 5000
    cfg.freeze()
    out = auto_scale_workers(cfg, 8)
    assert out.SOLVER.IMS_PER_BATCH == 16
    assert abs(out.SOLVER.BASE_LR - 0.04) < 1e-9
    assert out.SOLVER.MAX_ITER == 15000
    assert out.SOLVER.WARMUP_ITERS == 50
    assert tuple(out.SOLVER.STEPS) == (6000, 12000)
    assert out.TEST.EVAL_PERIOD == 2500
    assert out.SOLVER.CHECKPOINT_PERIOD == 2500
    assert out.SOLVER.REFERENCE_WORLD_SIZE == 8
    assert out.is_frozen()
    # idempotent at the new world size; original cfg untouched
    again = auto_scale_workers(out, 8)
    assert again.SOLVER.IMS_PER_BATCH == 16
    assert cfg.SOLVER.IMS_PER_BATCH == 8
    # disabled when REFERENCE_WORLD_SIZE == 0 (the default)
    cfg2 = get_cfg()
    base_bs = cfg2.SOLVER.IMS_PER_BATCH
    assert auto_scale_workers(cfg2, 8).SOLVER.IMS_PER_BATCH == base_bs
