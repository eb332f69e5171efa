"""WeaklySupervisedRCNNRPN: pseudo-GT RPN self-training from the weak stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


@pytest.mark.slow
def test_rpn_self_training_losses_present():
    mc = tiny_config(rpn_self_training=True, weak_rpn_score_threshold=0.0)
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    losses = model.apply(
        variables, jax.random.PRNGKey(1), _strong_batch(), _weak_batch(),
        method=WSRCNN.train_losses,
    )
    assert "loss_rpn_cls_weak" in losses and "loss_rpn_loc_weak" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # with an impossible threshold no pseudo boxes survive -> zero-ish losses
    mc2 = tiny_config(rpn_self_training=True, weak_rpn_score_threshold=2.0)
    model2 = WSRCNN(mc=mc2)
    losses2 = model2.apply(
        variables, jax.random.PRNGKey(1), _strong_batch(), _weak_batch(),
        method=WSRCNN.train_losses,
    )
    assert float(losses2["loss_rpn_loc_weak"]) == 0.0
