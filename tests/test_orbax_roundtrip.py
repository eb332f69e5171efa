"""orbax checkpoint save/restore roundtrip on a real TrainState."""

import numpy as np
import jax
import optax
import pytest

from unit_tpu.checkpoint import Checkpointer
from unit_tpu.engine import create_train_state
from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    model = WSRCNN(mc=tiny_config())
    opt = optax.sgd(1e-3, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))

    ckpt = Checkpointer(str(tmp_path), max_to_keep=2)
    host_state = jax.device_get(state)
    ckpt.save(7, host_state)
    assert ckpt.latest_step() == 7

    restored = ckpt.restore(template=host_state)
    leaves_a = jax.tree.leaves(host_state.params)
    leaves_b = jax.tree.leaves(restored.params if hasattr(restored, "params")
                               else restored["params"])
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
