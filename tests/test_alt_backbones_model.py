"""Full model with alternative backbones (dock/note config families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, _weak_batch


@pytest.mark.slow
def test_vgg_cnn_f_weak_model_with_loaded_proposals():
    mc = tiny_config(
        backbone_name="VGG_CNN_F",
        box_head_name="VGGCNNFBoxHead",
        rpn_conv_dim=256,
        pooler_resolution=6,
        load_proposals=True,
        multi_box_head=False,
        meta_architecture="WeakRCNN",
    )
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 96, 96, 3))
    sizes = jnp.asarray([[96, 96]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    assert "conv1" in variables["params"]["backbone"]

    weak = _weak_batch(h=96, w=96)
    rng = np.random.RandomState(0)
    props = np.zeros((1, 16, 4), np.float32)
    props[..., :2] = rng.rand(1, 16, 2) * 40
    props[..., 2:] = props[..., :2] + 20
    weak["proposals"] = jnp.asarray(props)
    weak["proposals_valid"] = jnp.ones((1, 16), bool)

    losses = model.apply(
        variables, jax.random.PRNGKey(1), None, weak, method=WSRCNN.train_losses
    )
    assert "loss_im_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(variables, imgs, sizes, method=WSRCNN.predict_weak_only)
    assert np.isfinite(np.asarray(det.scores)).all()
