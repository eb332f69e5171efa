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
