"""TTA evaluation through the runner (variant loader + jitted predict_tta)."""

import numpy as np
import pytest

from unit_tpu.config import get_cfg
from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from unit_tpu.models import ModelConfig, WSRCNN
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401
from tests.test_engine_integration import _tiny_cfg


@pytest.mark.slow
def test_tta_eval_through_runner(synthetic_voc):
    DatasetCatalog.clear()
    cfg = _tiny_cfg(synthetic_voc)
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (64, 80)
    cfg.TEST.AUG.MAX_SIZE = 112
    cfg.TEST.AUG.FLIP = True
    RegisterVOC(cfg, synthetic_voc).register_all()

    import jax

    mc = ModelConfig.from_cfg(cfg)
    model = WSRCNN(mc=mc)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )

    eval_fn = runner.make_eval_fn(cfg, model, image_loader=_fake_image_loader)
    results = eval_fn(variables["params"])
    assert "bbox" in results
    assert np.isfinite(results["bbox"]["AP50"])


@pytest.mark.slow
def test_tta_eval_with_precomputed_proposals(synthetic_voc, tmp_path):
    """TEST.AUG + MODEL.LOAD_PROPOSALS (dock-style models under TTA): the
    canonical-frame proposal file boxes are threaded through predict_tta
    instead of the (untrained) RPN — the reference's TTA transforms the
    precomputed proposals into each augmented frame (rcnn.py:47-83)."""
    import pickle

    DatasetCatalog.clear()
    cfg = _tiny_cfg(synthetic_voc)
    cfg.TEST.AUG.ENABLED = True
    cfg.TEST.AUG.MIN_SIZES = (64,)
    cfg.TEST.AUG.MAX_SIZE = 112
    cfg.TEST.AUG.FLIP = True
    RegisterVOC(cfg, synthetic_voc).register_all()

    # proposal file in ORIGINAL image coords, one entry per test record
    records = DatasetCatalog.get(cfg.DATASETS.TEST[0])
    table = {}
    rng = np.random.RandomState(3)
    for rec in records:
        h, w = rec["height"], rec["width"]
        boxes = np.stack([
            np.asarray([0, 0, w - 1, h - 1], np.float32),
            np.asarray([w * 0.1, h * 0.1, w * 0.6, h * 0.7], np.float32),
            np.asarray([w * 0.3, h * 0.2, w * 0.9, h * 0.9], np.float32),
        ])
        for ann in rec.get("annotations", [])[:5]:  # VOC records carry XYXY
            boxes = np.concatenate(
                [boxes, np.asarray([ann["bbox"]], np.float32)])
        table[str(rec["image_id"])] = {
            "boxes": boxes.astype(np.float32),
            "scores": rng.rand(len(boxes)).astype(np.float32),
        }
    pfile = tmp_path / "tta_props.pkl"
    with open(pfile, "wb") as f:
        pickle.dump(table, f)

    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.DATASETS.PROPOSAL_FILES_TEST = (str(pfile),)
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 8

    import jax
    import jax.numpy as jnp

    mc = ModelConfig.from_cfg(cfg)
    model = WSRCNN(mc=mc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )

    eval_fn = runner.make_eval_fn(cfg, model, image_loader=_fake_image_loader)
    results = eval_fn(variables["params"])
    assert "bbox" in results
    assert np.isfinite(results["bbox"]["AP50"])
