"""TrainerOnlyWeakFineTune wiring + PreciseBN hook (ref engine/defaults.py:402-425, :304-311)."""

import numpy as np
import pytest

import jax

from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from unit_tpu.engine.train import (
    TrainerFineTune,
    TrainerNoMeta,
    TrainerOnlyWeakFineTune,
)
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401
from tests.test_engine_integration import _tiny_cfg


def test_trainer_selection_explicit_and_auto(synthetic_voc):
    cfg = _tiny_cfg(synthetic_voc)
    assert runner.trainer_class_for(cfg) is TrainerNoMeta
    cfg.ENGINE.TRAINER = "TrainerOnlyWeakFineTune"
    assert runner.trainer_class_for(cfg) is TrainerOnlyWeakFineTune
    cfg.ENGINE.TRAINER = "TrainerFineTune"
    assert runner.trainer_class_for(cfg) is TrainerFineTune
    cfg.ENGINE.TRAINER = "NopeTrainer"
    with pytest.raises(KeyError):
        runner.trainer_class_for(cfg)


@pytest.mark.slow
def test_only_weak_finetune_step(synthetic_voc):
    """Classifier stream served as the boxed supervised batch; no weak stream."""
    DatasetCatalog.clear()
    cfg = _tiny_cfg(synthetic_voc)
    cfg.ENGINE.TRAINER = "TrainerOnlyWeakFineTune"
    cfg.DATASETS.TRAIN = ()  # the supervised stream comes from CLASSIFIER_TRAIN
    RegisterVOC(cfg, synthetic_voc).register_all()

    import unit_tpu.data.loader as loader_mod

    model, optimizer, trainer, mesh = runner.build_everything(cfg, num_devices=1)
    assert isinstance(trainer, TrainerOnlyWeakFineTune)
    assert trainer.weak_iter is None

    trainer.strong_iter = iter(loader_mod.build_classifier_strong_loader(
        cfg, image_loader=_fake_image_loader
    ))
    trainer.init_state(sample_shape=(1, 64, 64, 3))
    m = trainer.run_step()
    assert np.isfinite(m["total_loss"])
    # supervised losses present (train_only_weak=False semantics)
    assert any("rpn" in k or "cls" in k or "box" in k for k in m)


@pytest.mark.slow
def test_precise_bn_hook_refreshes_state(synthetic_voc):
    from unit_tpu.models import WSRCNN
    from tests.test_model_smoke import tiny_config

    mc = tiny_config()
    model = WSRCNN(mc=mc)
    import optax

    from unit_tpu.engine.train import TrainerBase

    trainer = TrainerBase(model, optax.sgd(1e-3))
    trainer.init_state(sample_shape=(1, 64, 64, 3))
    before = np.asarray(trainer.state.params["backbone"]["stem_conv1_bn"]["mean"]).copy()

    rng = np.random.RandomState(0)
    hook = runner.PreciseBNHook(
        model, cfg=None,
        loader_factory=lambda: iter(
            [{"image": rng.rand(1, 64, 64, 3).astype(np.float32) * 255}
             for _ in range(2)]
        ),
        eval_period=5, num_iter=2,
    )
    hook(step=3, metrics={}, trainer=trainer)  # off-period: no-op
    np.testing.assert_array_equal(
        before, np.asarray(trainer.state.params["backbone"]["stem_conv1_bn"]["mean"])
    )
    hook(step=5, metrics={}, trainer=trainer)  # on-period: stats refreshed
    after = np.asarray(trainer.state.params["backbone"]["stem_conv1_bn"]["mean"])
    assert not np.allclose(before, after)
