"""Gradient accumulation (TPU.GRAD_ACCUM): lax.scan over microbatches,
averaged gradients, one optimizer update — larger-effective-batch semantics
with one microbatch's activations resident at a time.  The reference has no
accumulation mode (effective batch capped by GPU memory)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unit_tpu.engine import TrainerNoMeta, create_train_state, make_train_step
from unit_tpu.models import WSRCNN
from unit_tpu.models.meta_arch import WSRCNN as _WSRCNN
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


def _stack(batches):
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


@pytest.mark.slow
def test_accum_step_matches_manual_average():
    """accum step over A microbatches == averaging the A per-microbatch
    gradients by hand and applying one optimizer update."""
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(11)

    strong4, weak4 = _strong_batch(b=4), _weak_batch(b=4)
    micros = [
        (jax.tree.map(lambda x: x[2 * i:2 * i + 2], strong4),
         jax.tree.map(lambda x: x[2 * i:2 * i + 2], weak4))
        for i in range(2)
    ]

    # manual reference: per-micro value_and_grad with the SAME rng folding
    def loss_fn(params, strong, weak, r):
        losses = model.apply({"params": params}, r, strong, weak,
                             method=_WSRCNN.train_losses)
        return sum(losses.values()), losses

    grads, totals = [], []
    for i, (s, w) in enumerate(micros):
        (t, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, s, w, jax.random.fold_in(rng, i)
        )
        grads.append(g)
        totals.append(float(t))
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
    updates, _ = opt.update(mean_g, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    step = make_train_step(model, opt, grad_accum=2)
    strong = _stack([m[0] for m in micros])
    weak = _stack([m[1] for m in micros])
    new_state, metrics = step(state, strong, weak, None, rng)

    np.testing.assert_allclose(
        float(metrics["total_loss"]), np.mean(totals), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(want_params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    assert int(new_state.step) == 1  # A microbatches = ONE optimizer step


@pytest.mark.slow
def test_accum_dp_matches_single_device():
    """grad accumulation composes with data parallelism: stacked [A, B, ...]
    microbatches shard their BATCH dim (dim 1) over the mesh; losses and
    updated params must match the single-device accum step."""
    from unit_tpu.parallel import make_mesh, replicate, shard_batch

    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)

    strong8, weak8 = _strong_batch(b=8), _weak_batch(b=8)
    strong = jax.tree.map(lambda x: np.stack([x[:4], x[4:]]), strong8)
    weak = jax.tree.map(lambda x: np.stack([x[:4], x[4:]]), weak8)

    step1 = make_train_step(model, opt, grad_accum=2)
    s1, m1 = step1(state, strong, weak, None, rng)

    mesh = make_mesh(4)
    state_r = replicate(mesh, create_train_state(model, opt, jax.random.PRNGKey(0)))
    stepd = make_train_step(model, opt, mesh=mesh, grad_accum=2)
    sd, md = stepd(state_r, shard_batch(mesh, strong, axis=1),
                   shard_batch(mesh, weak, axis=1), None, rng)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(md[k]), rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(jax.device_get(sd.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_trainer_stacks_same_shape_microbatches():
    """TrainerBase._next_stacked groups grad_accum same-canvas batches and
    buffers mismatched orientations for a later group."""
    shapes = [(2, 64, 96, 3), (2, 96, 64, 3), (2, 64, 96, 3), (2, 96, 64, 3)]
    batches = [{"image": np.full(s, i, np.float32)} for i, s in enumerate(shapes)]
    trainer = TrainerNoMeta.__new__(TrainerNoMeta)
    trainer.grad_accum = 2
    trainer._accum_buf = {"strong": {}, "weak": {}}

    it = iter(batches)
    g1 = trainer._next_stacked(it, trainer._accum_buf["strong"])
    assert g1["image"].shape == (2, 2, 64, 96, 3)
    np.testing.assert_array_equal(np.unique(g1["image"]), [0.0, 2.0])
    g2 = trainer._next_stacked(it, trainer._accum_buf["strong"])
    assert g2["image"].shape == (2, 2, 96, 64, 3)
    np.testing.assert_array_equal(np.unique(g2["image"]), [1.0, 3.0])
