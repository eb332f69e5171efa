"""Predictor module semantics: FT masking, evaluation outputs, zero inits."""

import jax
import jax.numpy as jnp
import numpy as np

from unit_tpu.models.predictors import SupervisedPredictor, WeakDetectorPredictor


def test_supervised_zero_init_deltas():
    m = SupervisedPredictor(num_classes=5)
    x = jnp.ones((3, 16))
    out, vars_ = m.init_with_output(jax.random.PRNGKey(0), x)
    # cls delta zero-init (fast_rcnn.py:319): scores exactly 0 at init
    np.testing.assert_allclose(np.asarray(out["delta_scores"]), 0.0)


def test_supervised_ft_heads_zero_init():
    m = SupervisedPredictor(num_classes=5, finetune=True)
    x = jnp.ones((3, 16))
    out, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(out["ft_scores"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["ft_deltas"]), 0.0)


def test_weak_detector_evaluation_stacks_oicr():
    m = WeakDetectorPredictor(num_classes=4, oicr_iter=3)
    x = jnp.asarray(np.random.RandomState(0).randn(6, 16).astype(np.float32))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    cls, bbox = m.apply(vars_, x, method=WeakDetectorPredictor.evaluation)
    assert cls.shape == (3, 6, 5)
    assert bbox.shape == (6, 16)
    np.testing.assert_allclose(np.asarray(bbox), 0.0)  # no regressor -> zeros


def test_weak_detector_ft_masks_novel_at_init():
    """FT streams: novel columns of the base stream are zeroed, deltas zero-init
    => at init the FT evaluation equals the novel-masked base evaluation
    (weak_detector_fast_rcnn.py:557-562,582)."""
    novel = (1, 3)
    base_m = WeakDetectorPredictor(num_classes=4, oicr_iter=2)
    x = jnp.asarray(np.random.RandomState(1).randn(5, 8).astype(np.float32))
    base_vars = base_m.init(jax.random.PRNGKey(0), x)

    ft_m = WeakDetectorPredictor(num_classes=4, oicr_iter=2, finetune=True,
                                 novel_ids=novel)
    ft_vars = ft_m.init(jax.random.PRNGKey(0), x)
    # graft base params into the ft tree (shared names)
    params = dict(ft_vars["params"])
    for k in base_vars["params"]:
        params[k] = base_vars["params"][k]
    cls_ft, _ = ft_m.apply({"params": params}, x,
                           method=WeakDetectorPredictor.evaluation)
    cls_base, _ = base_m.apply(base_vars, x,
                               method=WeakDetectorPredictor.evaluation)
    want = np.array(cls_base, copy=True)
    want[..., list(novel)] = 0.0
    np.testing.assert_allclose(np.asarray(cls_ft), want, atol=1e-5)


def test_temperatures_divide_streams():
    m = WeakDetectorPredictor(num_classes=4, oicr_iter=0, detector_temp=2.0,
                              classifier_temp=4.0)
    x = jnp.asarray(np.random.RandomState(2).randn(3, 8).astype(np.float32))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    m1 = WeakDetectorPredictor(num_classes=4, oicr_iter=0)
    out1 = m1.apply(vars_, x)
    np.testing.assert_allclose(
        np.asarray(out["classifier_stream"]) * 4.0,
        np.asarray(out1["classifier_stream"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["detection_stream"]) * 2.0,
        np.asarray(out1["detection_stream"]), atol=1e-5,
    )
