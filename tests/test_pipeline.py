"""Pipeline parallelism (2-stage GPipe over a (data x stage) mesh).

Beyond-reference scaling (SURVEY §2.6: the reference is DP-only): the train
step splits at the backbone/heads boundary and pipelines the grad-accum
microbatches through the two stages with a ppermute feature handoff; the
backward pipeline arises from the ppermute's AD transpose.  Parity bar: the
pipelined step must produce the SAME losses and updated params as the
single-device grad-accumulation step (they share averaged-microbatch
semantics exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unit_tpu.engine.train import (
    TrainerBase,
    create_train_state,
    make_pipeline_train_step,
    make_train_step,
)
from unit_tpu.models import WSRCNN
from unit_tpu.parallel import make_mesh_pp, replicate, shard_batch

from tests.test_model_smoke import tiny_config


def tiny_model():
    model = WSRCNN(mc=tiny_config(roi_batch_size=16, weak_proposal_count=16))
    return model, optax.sgd(1e-3, momentum=0.9)


def _stacked_batches(m, b, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((m, b, 4, 4), np.float32)
    boxes[..., :2] = rng.rand(m, b, 4, 2) * 20
    boxes[..., 2:] = boxes[..., :2] + 10
    strong = {
        "image": jnp.asarray(rng.rand(m, b, 64, 64, 3), jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((m, b, 4), jnp.int32),
        "gt_valid": jnp.ones((m, b, 4), bool),
        "image_size": jnp.asarray([[[64, 64]] * b] * m, jnp.float32),
    }
    labels = np.zeros((m, b, 20), np.float32)
    labels[..., [1, 7]] = 1.0
    weak = {
        "image": jnp.asarray(rng.rand(m, b, 64, 64, 3), jnp.float32),
        "labels": jnp.asarray(labels),
        "image_size": jnp.asarray([[[64, 64]] * b] * m, jnp.float32),
    }
    return strong, weak


@pytest.mark.slow
def test_pipeline_matches_grad_accum():
    """(1 x 2) pipeline == single-device grad_accum: losses AND params."""
    model, opt = tiny_model()
    m, b = 3, 1
    strong, weak = _stacked_batches(m, b)
    key = jax.random.PRNGKey(1)

    state_a = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    step_a = make_train_step(model, opt, grad_accum=m)
    new_a, metrics_a = step_a(state_a, strong, weak, None, key)

    mesh = make_mesh_pp(1, 2)
    state_p = replicate(
        mesh, create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    )
    step_p = make_pipeline_train_step(model, opt, mesh, n_micro=m)
    new_p, metrics_p = step_p(
        state_p, shard_batch(mesh, strong, axis=1),
        shard_batch(mesh, weak, axis=1), None, key,
    )

    for k in metrics_a:
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_p[k]), rtol=2e-4, atol=2e-5,
            err_msg=k,
        )
    pa = jax.tree_util.tree_leaves_with_path(new_a.params)
    pp = dict(jax.tree_util.tree_leaves_with_path(new_p.params))
    for path, va in pa:
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(pp[path]), rtol=1e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_pipeline_4stage_matches_grad_accum():
    """(1 x 4) pipeline (stem+res2 | res3 | res4 | heads) == grad_accum.

    Exercises the N-stage generalization: intra-backbone segment splits,
    heterogeneous boundary shapes riding the flat handoff buffer, and a
    3-hop ppermute chain with its AD-transposed backward pipeline."""
    model, opt = tiny_model()
    m, b = 4, 1
    strong, weak = _stacked_batches(m, b)
    key = jax.random.PRNGKey(1)

    state_a = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    step_a = make_train_step(model, opt, grad_accum=m)
    new_a, metrics_a = step_a(state_a, strong, weak, None, key)

    mesh = make_mesh_pp(1, 4)
    state_p = replicate(
        mesh, create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    )
    step_p = make_pipeline_train_step(model, opt, mesh, n_micro=m)
    new_p, metrics_p = step_p(
        state_p, shard_batch(mesh, strong, axis=1),
        shard_batch(mesh, weak, axis=1), None, key,
    )

    for k in metrics_a:
        np.testing.assert_allclose(
            float(metrics_a[k]), float(metrics_p[k]), rtol=2e-4, atol=2e-5,
            err_msg=k,
        )
    pa = jax.tree_util.tree_leaves_with_path(new_a.params)
    pp = dict(jax.tree_util.tree_leaves_with_path(new_p.params))
    for path, va in pa:
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(pp[path]), rtol=1e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_stage_count_validation():
    model, opt = tiny_model()
    mesh = make_mesh_pp(1, 6)  # tiny depth-26 backbone: 4 units -> max 5 stages
    with pytest.raises(AssertionError, match="stages"):
        make_pipeline_train_step(model, opt, mesh, n_micro=2)


def test_balanced_unit_groups():
    """The minimax partition is exact and balanced for the real depths."""
    from unit_tpu.engine.train import _balanced_unit_groups

    # R-101: stem + 3 + 4 + 23 blocks = 31 units; stage-granular grouping
    # would be 3.5 | 4 | 23 — block granularity must get within 1 block of
    # the ideal 30.5/3.
    costs = [0.5] + [1.0] * 30
    groups = _balanced_unit_groups(costs, 3)
    assert [st for st, _ in groups] == sorted({st for st, _ in groups})
    assert groups[0][0] == 0 and groups[-1][1] == 31
    sums = [sum(costs[a:b]) for a, b in groups]
    assert max(sums) <= 30.5 / 3 + 1.0, sums
    # R-50 at 3 groups: 13.5 total, ideal 4.5 per group.
    costs50 = [0.5] + [1.0] * 13
    sums50 = [sum(costs50[a:b]) for a, b in _balanced_unit_groups(costs50, 3)]
    assert max(sums50) <= 5.0, sums50
    # degenerate cases
    assert _balanced_unit_groups([0.5], 1) == [(0, 1)]
    assert _balanced_unit_groups([0.5, 1.0, 1.0], 3) == [(0, 1), (1, 2), (2, 3)]


def test_backbone_unit_chain_matches_full_forward():
    """Chaining block-granular backbone segments == the full backbone pass.

    Pure-CPU check of the per-stage compute the pipeline schedule places on
    devices: any contiguous unit split must compose to the monolithic
    forward (same params, same output)."""
    from unit_tpu.models.resnet import num_units

    model, _ = tiny_model()
    rng = np.random.RandomState(0)
    b = 1
    strong = {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3), jnp.float32),
        "image_size": jnp.asarray([[64, 64]] * b, jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64.0, 64.0]]),
    )["params"]

    full = model.apply(
        {"params": params}, strong=strong, weak=None,
        method=WSRCNN.backbone_features,
    )
    n = num_units(model.mc.depth)
    for bounds in [(0, 2, n), (0, 1, 3, n)]:
        x = None
        for st, sp in zip(bounds[:-1], bounds[1:]):
            x = model.apply(
                {"params": params},
                strong=strong if st == 0 else None,
                feats=x, start_unit=st, stop_unit=sp,
                method=WSRCNN.backbone_segment,
            )
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(full), rtol=1e-5, atol=1e-5,
            err_msg=str(bounds),
        )


@pytest.mark.slow
def test_pipeline_dp_x_pp_and_strong_only():
    """(2 x 2) dp x pp runs finite; strong-only (fine-tune) stream works."""
    model, opt = tiny_model()
    m, b = 2, 2
    strong, weak = _stacked_batches(m, b)
    key = jax.random.PRNGKey(1)

    mesh = make_mesh_pp(2, 2)
    state = replicate(
        mesh, create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    )
    step = make_pipeline_train_step(model, opt, mesh, n_micro=m)
    _, metrics = step(
        state, shard_batch(mesh, strong, axis=1),
        shard_batch(mesh, weak, axis=1), None, key,
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # strong-only: the TrainerFineTune shape (weak stream absent)
    state2 = replicate(
        mesh, create_train_state(model, opt, jax.random.PRNGKey(0), (1, 64, 64, 3))
    )
    step_s = make_pipeline_train_step(model, opt, mesh, n_micro=m)
    _, metrics_s = step_s(state2, shard_batch(mesh, strong, axis=1), None, None, key)
    for k, v in metrics_s.items():
        assert np.isfinite(float(v)), k


def test_pipeline_knob_validation():
    model, opt = tiny_model()
    mesh = make_mesh_pp(1, 2)
    with pytest.raises(AssertionError, match="GRAD_ACCUM"):
        make_pipeline_train_step(model, opt, mesh, n_micro=1)
    with pytest.raises(ValueError, match="GRAD_ACCUM"):
        TrainerBase(model, opt, mesh=mesh, pp=True, grad_accum=1)
    with pytest.raises(ValueError, match="FSDP/TP"):
        TrainerBase(model, opt, mesh=mesh, pp=True, grad_accum=2, fsdp=True)


def test_next_stacked_pair_joint_canvas():
    """PP stacking emits strong/weak groups sharing ONE canvas even when the
    streams' orientations interleave differently."""
    model, opt = tiny_model()
    mesh = make_mesh_pp(1, 2)

    def stream(shapes):
        i = 0
        while True:
            h, w = shapes[i % len(shapes)]
            yield {"image": np.zeros((1, h, w, 3), np.float32), "tag": np.full((1,), i)}
            i += 1

    tr = TrainerBase(
        model, opt,
        strong_iter=stream([(64, 96), (96, 64), (64, 96), (96, 64)]),
        weak_iter=stream([(96, 64), (96, 64), (64, 96), (64, 96)]),
        mesh=mesh, pp=True, grad_accum=2,
    )
    s, w = tr._next_stacked_pair()
    assert s["image"].shape[2:4] == w["image"].shape[2:4]
    s2, w2 = tr._next_stacked_pair()
    assert s2["image"].shape[2:4] == w2["image"].shape[2:4]
