import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unit_tpu.models.resnet import FrozenBN
from unit_tpu.utils.precise_bn import precise_bn
from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config


def test_frozen_bn_sows_stats():
    bn = FrozenBN(4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3, 4).astype(np.float32))
    vars_ = bn.init(jax.random.PRNGKey(0), x)
    y, aux = bn.apply(vars_, x, mutable=["bn_stats"])
    stats = aux["bn_stats"]
    np.testing.assert_allclose(
        np.asarray(stats["batch_mean"][0]), np.asarray(x).mean((0, 1, 2)), atol=1e-5
    )


@pytest.mark.slow
def test_precise_bn_updates_backbone_stats():
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    params = variables["params"]

    rng = np.random.RandomState(0)
    batches = iter(
        [{"image": rng.rand(1, 64, 64, 3).astype(np.float32) * 255} for _ in range(2)]
    )
    new_params = precise_bn(model, params, batches, num_iters=2)
    old = np.asarray(params["backbone"]["stem_conv1_bn"]["mean"])
    new = np.asarray(new_params["backbone"]["stem_conv1_bn"]["mean"])
    assert not np.allclose(old, new)  # stats actually refreshed
    # other params untouched
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["stem_conv1"]["kernel"]),
        np.asarray(new_params["backbone"]["stem_conv1"]["kernel"]),
    )
