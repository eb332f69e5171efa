"""Multi-dataset eval through the runner: results keyed per dataset.

Regression for the round-1 bug where ``make_eval_fn`` reassigned ``results``
inside the ``for name in cfg.DATASETS.TEST`` loop, silently dropping every
dataset but the last (reference accumulates per-dataset and flattens only the
single-dataset case, engine/defaults.py:219-248).

The model predict is stubbed (the plumbing under test is the accumulation, not
detection quality), keeping this a fast test.
"""

import types

import numpy as np
import pytest

from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401
from tests.test_engine_integration import _tiny_cfg


def _stub_predict_fn(model, mesh=None):
    def predict(params, images, image_sizes):
        b = np.asarray(images).shape[0]
        return types.SimpleNamespace(
            boxes=np.tile([[10.0, 10.0, 40.0, 40.0]], (b, 3, 1)),
            scores=np.full((b, 3), 0.9, np.float32),
            classes=np.zeros((b, 3), np.int32),
            valid=np.ones((b, 3), bool),
            masks=None,
        )

    return predict


def test_eval_accumulates_per_dataset(synthetic_voc, monkeypatch):
    DatasetCatalog.clear()
    cfg = _tiny_cfg(synthetic_voc)
    cfg.TEST.AUG.ENABLED = False
    cfg.DATASETS.TEST = (
        "voc_base_training_query_train",
        "voc_base_training_query_val",
    )
    RegisterVOC(cfg, synthetic_voc).register_all()
    monkeypatch.setattr(runner, "make_predict_fn", _stub_predict_fn)

    eval_fn = runner.make_eval_fn(cfg, model=None, image_loader=_fake_image_loader)
    results = eval_fn({})

    # both datasets present, each with its own metrics
    assert set(results.keys()) == set(cfg.DATASETS.TEST)
    for name in cfg.DATASETS.TEST:
        assert "bbox" in results[name]
        assert np.isfinite(results[name]["bbox"]["AP50"])

    # single-dataset shape stays flat (d2 DefaultTrainer.test parity)
    cfg2 = _tiny_cfg(synthetic_voc)
    cfg2.TEST.AUG.ENABLED = False
    eval_fn1 = runner.make_eval_fn(cfg2, model=None, image_loader=_fake_image_loader)
    flat = eval_fn1({})
    assert "bbox" in flat
