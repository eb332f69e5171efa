"""Batched non-TTA eval (TPU.EVAL_BATCH_SIZE) matches batch-1 results.

The reference's inference path is batch-1 only (rcnn.py:494); our predict path
is batched, and the runner threads TPU.EVAL_BATCH_SIZE into build_test_loader.
A per-image-dependent stub predictor verifies each image's detections land on
the right image_id through batching + final-partial-batch padding.
"""

import types

import numpy as np

from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401
from tests.test_engine_integration import _tiny_cfg


def _stub_predict_fn(model, mesh=None):
    def predict(params, images, image_sizes):
        # boxes depend on the per-image content so a row mix-up changes metrics
        imgs = np.asarray(images)
        b = imgs.shape[0]
        shift = imgs.reshape(b, -1).mean(axis=1) % 7.0
        base = np.tile([[10.0, 10.0, 40.0, 40.0]], (b, 3, 1))
        boxes = base + shift[:, None, None]
        return types.SimpleNamespace(
            boxes=boxes,
            scores=np.full((b, 3), 0.9, np.float32),
            classes=np.zeros((b, 3), np.int32),
            valid=np.ones((b, 3), bool),
            masks=None,
        )

    return predict


def test_batched_eval_matches_batch1(synthetic_voc, monkeypatch):
    DatasetCatalog.clear()
    results = {}
    for bs in (1, 2, 3):
        cfg = _tiny_cfg(synthetic_voc)
        cfg.TEST.AUG.ENABLED = False
        cfg.TPU.EVAL_BATCH_SIZE = bs
        DatasetCatalog.clear()
        RegisterVOC(cfg, synthetic_voc).register_all()
        monkeypatch.setattr(runner, "make_predict_fn", _stub_predict_fn)
        eval_fn = runner.make_eval_fn(cfg, model=None,
                                      image_loader=_fake_image_loader)
        results[bs] = eval_fn({})

    for bs in (2, 3):
        for key, val in results[1]["bbox"].items():
            if isinstance(val, dict):
                continue  # per-class breakdown tables
            assert np.isclose(val, results[bs]["bbox"][key], equal_nan=True), (
                bs, key, val, results[bs]["bbox"][key],
            )
