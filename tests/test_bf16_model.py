"""bf16 compute path (the production TPU dtype) on the CPU mesh.

The benchmark recipe runs COMPUTE_DTYPE=bfloat16 end to end; this keeps the
dtype plumbing (backbone/head dtype casts, f32 loss accumulation, bf16 pooled
features) exercised off-hardware too.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


@pytest.mark.slow
def test_bf16_train_losses_finite():
    mc = dataclasses.replace(tiny_config(), compute_dtype="bfloat16")
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    # params stay f32 masters; only compute casts to bf16
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32

    losses = model.apply(
        variables, jax.random.PRNGKey(1), _strong_batch(), _weak_batch(),
        False, None, method=WSRCNN.train_losses,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        # losses must be accumulated in f32, not bf16
        assert v.dtype == jnp.float32, (k, v.dtype)


@pytest.mark.slow
def test_bf16_predict_runs():
    mc = dataclasses.replace(tiny_config(), compute_dtype="bfloat16")
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    det = model.apply(variables, imgs, sizes, method=WSRCNN.predict)
    assert np.asarray(det.boxes).shape[0] == 1
    assert np.isfinite(np.asarray(det.scores)).all()
