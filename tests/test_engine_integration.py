"""End-to-end engine integration: runner-built trainer on synthetic VOC data.

Exercises the reference's script path (SURVEY.md §3.1) in miniature: config ->
dataset registration -> loaders -> trainer -> 2 train steps -> eval with the VOC
evaluator, all through unit_tpu.engine.runner plumbing.
"""

import numpy as np
import pytest

import jax

from unit_tpu.config import get_cfg
from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401


def _tiny_cfg(synthetic_voc):
    cfg = get_cfg()
    cfg.DATASETS.CLASSIFIER_DATAROOT = synthetic_voc
    cfg.DATASETS.TRAIN = ("voc_base_training_query_train",)
    cfg.DATASETS.TEST = ("voc_base_training_query_val",)
    cfg.DATASETS.CLASSIFIER_TRAIN = ("pascal_trainval_2007",)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.MODEL.RESNETS.DEPTH = 26
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.MULTI_BOX_HEAD = True
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.TPU.ROI_ALIGN_SAMPLING_RATIO = 2
    return cfg


@pytest.mark.slow
def test_runner_train_and_eval(synthetic_voc, monkeypatch):
    DatasetCatalog.clear()
    cfg = _tiny_cfg(synthetic_voc)
    RegisterVOC(cfg, synthetic_voc).register_all()

    # patch image loading to synthetic arrays (no JPEGs on disk)
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
    trainer.init_state(sample_shape=(1, 64, 64, 3))

    m1 = trainer.run_step()
    m2 = trainer.run_step()
    assert np.isfinite(m1["total_loss"]) and np.isfinite(m2["total_loss"])
    assert int(trainer.state.step) == 2

    # eval path
    from unit_tpu.data import build_test_loader
    from unit_tpu.data.utils import get_evaluator
    from unit_tpu.evaluation import inference_on_dataset
    from unit_tpu.engine import make_predict_fn

    loader, n = build_test_loader(
        cfg, "voc_base_training_query_val", image_loader=_fake_image_loader
    )
    evaluator = get_evaluator(cfg, "voc_base_training_query_val")
    for rec in DatasetCatalog.get("voc_base_training_query_val"):
        evaluator.process_gt_record(rec)
    predict = make_predict_fn(model)
    results = inference_on_dataset(
        lambda im, sz: predict(trainer.state.params, im, sz), loader, evaluator, n
    )
    assert "bbox" in results
    assert "AP50" in results["bbox"]
    assert np.isfinite(results["bbox"]["AP50"])
