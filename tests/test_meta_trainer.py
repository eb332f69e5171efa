"""End-to-end meta (support-stream) trainer: the reference `Trainer` path.

Exercises the shipped VOC-RCNN-101-C4-split1-meta.yaml machinery in miniature
(ref engine/defaults.py:41-125: three loaders per step — strong query, weak
classifier, per-class support shots — with the visual-attention rank loss from
roi_heads.py:409-420), through runner.build_everything trainer selection.
"""

import numpy as np
import pytest

from unit_tpu.config import get_cfg
from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from unit_tpu.engine.train import Trainer
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401
from tests.test_engine_integration import _tiny_cfg


def _meta_cfg(synthetic_voc):
    cfg = _tiny_cfg(synthetic_voc)
    cfg.MODEL.META_ARCHITECTURE = "WeaklySupervisedRCNN"
    cfg.MODEL.ROI_HEADS.NAME = "WSROIHead"
    cfg.INPUT.META_MIN_SIZE = 64
    cfg.DATASETS.FEWSHOT.NUM_SHOTS = 2
    return cfg


def test_meta_config_selects_meta_trainer(synthetic_voc):
    cfg = _meta_cfg(synthetic_voc)
    assert runner.trainer_class_for(cfg) is Trainer


def test_shipped_meta_yaml_selects_meta_trainer():
    import os

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "VOC",
        "VOC-RCNN-101-C4-split1-meta.yaml",
    ))
    assert cfg.MODEL.META_ARCHITECTURE == "WeaklySupervisedRCNN"
    assert runner.trainer_class_for(cfg) is Trainer


@pytest.mark.slow
def test_meta_trainer_steps_and_eval(synthetic_voc, monkeypatch):
    DatasetCatalog.clear()
    cfg = _meta_cfg(synthetic_voc)
    RegisterVOC(cfg, synthetic_voc).register_all()

    import unit_tpu.data.transforms as T

    monkeypatch.setattr(T, "load_image_bgr", lambda path: None)
    import unit_tpu.data.loader as loader_mod

    model, optimizer, trainer, mesh = runner.build_everything(cfg, num_devices=1)
    assert isinstance(trainer, Trainer)
    assert trainer.meta_iter is not None

    trainer.strong_iter = iter(
        loader_mod.build_strong_loader(cfg, image_loader=_fake_image_loader)
    )
    trainer.weak_iter = iter(
        loader_mod.build_classifier_loader(cfg, image_loader=_fake_image_loader)
    )
    trainer.meta_iter = iter(
        loader_mod.build_support_loader(
            cfg, "voc_base_training_support", image_loader=_fake_image_loader
        )
    )
    trainer.init_state(sample_shape=(1, 64, 64, 3))

    m1 = trainer.run_step()
    m2 = trainer.run_step()
    # the support stream's visual-attention rank losses are live and finite
    for key in ("loss_rank_margin", "loss_rank_reg", "loss_rank_cls"):
        assert key in m1, sorted(m1)
        assert np.isfinite(m1[key]) and np.isfinite(m2[key])
    assert np.isfinite(m1["total_loss"]) and np.isfinite(m2["total_loss"])

    # inference still runs (meta attention does not feed inference similarity:
    # the reference's visual_attention_head.inference call at
    # roi_heads.py:386-388 is commented out; active code uses weak posteriors)
    from unit_tpu.data import build_test_loader
    from unit_tpu.engine import make_predict_fn

    loader, n = build_test_loader(
        cfg, "voc_base_training_query_val", image_loader=_fake_image_loader
    )
    predict = make_predict_fn(model)
    batch = next(iter(loader))
    det = predict(trainer.state.params, batch["image"], batch["image_size"])
    assert np.asarray(det.boxes).ndim == 3

    # full eval through make_eval_fn: the meta path precomputes the support
    # prototypes once (Trainer.get_meta_attention, defaults.py:180-194) and
    # routes through inference_on_dataset_meta
    cfg.DATASETS.BASE_META_SHOTS = 2  # deterministic support pass stays tiny
    eval_fn = runner.make_eval_fn(cfg, model, image_loader=_fake_image_loader)
    res = eval_fn(trainer.state)
    assert "bbox" in res and np.isfinite(res["bbox"]["AP50"])


@pytest.mark.slow
def test_meta_rank_loss_when_sampler_slots_below_roi_batch_size(
    synthetic_voc, monkeypatch
):
    """Regression: rank-loss subsample must use the sampler's ACTUAL slot
    count.  When POST_NMS_TOPK_TRAIN + MAX_GT_BOXES < BATCH_SIZE_PER_IMAGE the
    sampler emits fewer than roi_batch_size proposals per image; the rank-loss
    reshape used to hardcode mc.roi_batch_size and crash (found by the meta
    CLI chip-smoke, round 4).  Ref: roi_heads.py:409-420 subsamples whatever
    proposal set exists."""
    DatasetCatalog.clear()
    cfg = _meta_cfg(synthetic_voc)
    # 64 post-NMS + 10 GT slots = 74 < 128 requested per image
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 128
    RegisterVOC(cfg, synthetic_voc).register_all()

    import unit_tpu.data.transforms as T

    monkeypatch.setattr(T, "load_image_bgr", lambda path: None)
    import unit_tpu.data.loader as loader_mod

    model, optimizer, trainer, mesh = runner.build_everything(cfg, num_devices=1)
    trainer.strong_iter = iter(
        loader_mod.build_strong_loader(cfg, image_loader=_fake_image_loader)
    )
    trainer.weak_iter = iter(
        loader_mod.build_classifier_loader(cfg, image_loader=_fake_image_loader)
    )
    trainer.meta_iter = iter(
        loader_mod.build_support_loader(
            cfg, "voc_base_training_support", image_loader=_fake_image_loader
        )
    )
    trainer.init_state(sample_shape=(1, 64, 64, 3))
    m1 = trainer.run_step()
    for key in ("loss_rank_margin", "loss_rank_reg", "loss_rank_cls"):
        assert key in m1 and np.isfinite(m1[key])
