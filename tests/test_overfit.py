"""Learning-dynamics test: the loss must fall when overfitting one sample.

The reference has no tests (SURVEY.md §4); this is the cheap substitute for a
full training run — a tiny model repeatedly stepped on a single synthetic batch
must reduce its supervised and weak losses substantially.
"""

import jax
import numpy as np
import optax
import pytest

from unit_tpu.engine import create_train_state, make_train_step
from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


@pytest.mark.slow
def test_single_batch_overfit_reduces_losses():
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(2e-3, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt)

    strong, weak = _strong_batch(), _weak_batch()
    history = []
    for i in range(25):
        state, metrics = step(state, strong, weak, None, jax.random.PRNGKey(42))
        history.append({k: float(v) for k, v in metrics.items()})

    first, last = history[0], history[-1]
    assert all(np.isfinite(list(last.values()))), last
    assert last["total_loss"] < first["total_loss"] * 0.7, (first, last)
    assert last["loss_rpn_cls"] < first["loss_rpn_cls"]
    assert last["loss_im_cls"] < first["loss_im_cls"]
