"""Alternative backbones produce stride-16 maps and run with the model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models.backbones import VGG16, VGGCNNF, InceptionResNetV2, LocalResponseNorm


@pytest.mark.slow
def test_vgg16_stride16():
    m = VGG16()
    x = jnp.zeros((1, 64, 64, 3))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 4, 4, 512)


def test_vgg16_dilated_same_stride():
    m = VGG16(dilated=True)
    x = jnp.zeros((1, 64, 64, 3))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 4, 4, 512)


def test_vgg_cnn_f_runs():
    m = VGGCNNF()
    x = jnp.zeros((1, 128, 128, 3))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape[-1] == 256
    assert y.shape[1] >= 6


def test_lrn_matches_formula():
    x = np.abs(np.random.RandomState(0).randn(1, 2, 2, 8).astype(np.float32))
    m = LocalResponseNorm()
    y, _ = m.init_with_output(jax.random.PRNGKey(0), jnp.asarray(x))
    # manual for channel 0: window covers channels [0..2]
    acc = (x[..., :3] ** 2).sum(-1)
    want = x[..., 0] / (2.0 + 1e-4 * acc) ** 0.75
    np.testing.assert_allclose(np.asarray(y)[..., 0], want, rtol=1e-5)


@pytest.mark.slow
def test_inception_resnet_v2_runs():
    m = InceptionResNetV2(num_block35=1, num_block17=1)
    x = jnp.zeros((1, 96, 96, 3))
    y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape[-1] == 1088
