"""Data-parallel train step over the faked 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unit_tpu.engine import TrainerNoMeta, create_train_state, make_train_step
from unit_tpu.models import WSRCNN
from unit_tpu.parallel import make_mesh, replicate, shard_batch
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


@pytest.mark.slow
def test_dp_train_step_on_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(1e-3, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))
    state = replicate(mesh, state)

    step = make_train_step(model, opt, mesh=mesh)
    strong = shard_batch(mesh, _strong_batch(b=8))
    weak = shard_batch(mesh, _weak_batch(b=8))

    state2, metrics = step(state, strong, weak, None, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1

    # params stay replicated and actually changed
    p_new = state2.params["supervised"]["cls_score_delta"]["bias"]
    assert p_new.sharding.is_fully_replicated
    state3, _ = step(state2, strong, weak, None, jax.random.PRNGKey(2))
    assert int(state3.step) == 2


@pytest.mark.slow
def test_dp_matches_single_device_loss():
    """The sharded step must compute the same global loss as single-device."""
    mesh = make_mesh(8)
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(0.0)  # lr 0: state unchanged, just compare metrics
    state = create_train_state(model, opt, jax.random.PRNGKey(0))

    strong, weak = _strong_batch(b=8), _weak_batch(b=8)
    step1 = make_train_step(model, opt)
    _, m1 = step1(state, strong, weak, None, jax.random.PRNGKey(7))

    state_r = replicate(mesh, create_train_state(model, opt, jax.random.PRNGKey(0)))
    step8 = make_train_step(model, opt, mesh=mesh)
    _, m8 = step8(state_r, shard_batch(mesh, strong), shard_batch(mesh, weak), None,
                  jax.random.PRNGKey(7))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_fsdp_matches_single_device():
    """FSDP (params + opt state sharded over 'data'): XLA inserts per-layer
    all-gathers and a gradient reduce-scatter; losses AND the updated params
    must match the single-device step."""
    from unit_tpu.parallel import fsdp_shard, fsdp_sharding

    mesh = make_mesh(8)
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))

    strong, weak = _strong_batch(b=8), _weak_batch(b=8)
    step1 = make_train_step(model, opt)
    s1, m1 = step1(state, strong, weak, None, jax.random.PRNGKey(7))

    state_f = fsdp_shard(mesh, create_train_state(model, opt, jax.random.PRNGKey(0)))
    stepf = make_train_step(
        model, opt, mesh=mesh, state_sharding=fsdp_sharding(mesh, state_f)
    )
    sf, mf = stepf(state_f, shard_batch(mesh, strong), shard_batch(mesh, weak), None,
                   jax.random.PRNGKey(7))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(mf[k]), rtol=2e-4, atol=1e-5)

    # at least one large leaf is genuinely sharded 8-ways, and stays so
    w_f = sf.params["backbone"]["res4"]["block0"]["conv1"]["kernel"]
    assert not w_f.sharding.is_fully_replicated
    assert len(w_f.sharding.device_set) == 8

    # updated params equal the single-device update (gathered)
    flat1 = jax.tree.leaves(s1.params)
    flatf = jax.tree.leaves(jax.device_get(sf.params))
    for a, b in zip(flat1, flatf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_tp_matches_single_device():
    """Tensor parallelism over a 2-D (data x model) mesh: big kernels'
    output channels split over 'model', GSPMD propagating activation
    shardings and inserting the collectives — losses AND updated params must
    match the single-device step."""
    from unit_tpu.parallel import make_mesh_tp, tp_shard, tp_sharding

    mesh = make_mesh_tp(4, 2)
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))

    strong, weak = _strong_batch(b=8), _weak_batch(b=8)
    step1 = make_train_step(model, opt)
    s1, m1 = step1(state, strong, weak, None, jax.random.PRNGKey(7))

    state_t = tp_shard(mesh, create_train_state(model, opt, jax.random.PRNGKey(0)))
    # the tiny config must actually have TP-sharded leaves, else this tests nothing
    shardings = jax.tree.leaves(tp_sharding(mesh, state_t.params))
    assert any(not s.is_fully_replicated for s in shardings)

    stept = make_train_step(
        model, opt, mesh=mesh, state_sharding=tp_sharding(mesh, state_t)
    )
    st, mt = stept(state_t, shard_batch(mesh, strong), shard_batch(mesh, weak), None,
                   jax.random.PRNGKey(7))
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(mt[k]), rtol=2e-4, atol=1e-5)

    # updated params equal the single-device update (gathered)
    flat1 = jax.tree.leaves(s1.params)
    flatt = jax.tree.leaves(jax.device_get(st.params))
    for a, b in zip(flat1, flatt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_trainer_fsdp_knob():
    """TPU.FSDP wiring through TrainerBase: init_state FSDP-shards the state,
    run_step lazily builds the step from the state's derived shardings, and a
    large param leaf stays sharded 8-ways after the update."""
    mesh = make_mesh(8)
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(1e-3, momentum=0.9)
    trainer = TrainerNoMeta(
        model, opt,
        strong_iter=iter(lambda: _strong_batch(b=8), None),
        weak_iter=iter(lambda: _weak_batch(b=8), None),
        mesh=mesh, fsdp=True,
    )
    assert trainer.train_step is None  # built lazily once a state exists
    trainer.init_state()
    w = trainer.state.params["backbone"]["res4"]["block0"]["conv1"]["kernel"]
    assert not w.sharding.is_fully_replicated

    metrics = trainer.run_step()
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    assert int(trainer.state.step) == 1
    w2 = trainer.state.params["backbone"]["res4"]["block0"]["conv1"]["kernel"]
    assert not w2.sharding.is_fully_replicated
    assert len(w2.sharding.device_set) == 8


@pytest.mark.slow
def test_spatial_2d_mesh_matches_single_device_loss():
    """(data x spatial) 2-D mesh: images sharded on (batch, height); XLA's SPMD
    partitioner splits the backbone convs spatially (halo exchange) and gathers
    where full feature maps are needed — global losses must match single-device."""
    from unit_tpu.parallel.mesh import make_mesh_2d, shard_batch_spatial

    mc = tiny_config()
    model = WSRCNN(mc=mc)
    opt = optax.sgd(0.0)
    state = create_train_state(model, opt, jax.random.PRNGKey(0))

    strong, weak = _strong_batch(b=4), _weak_batch(b=4)
    step1 = make_train_step(model, opt)
    _, m1 = step1(state, strong, weak, None, jax.random.PRNGKey(7))

    mesh = make_mesh_2d(4, 2)
    state_r = replicate(mesh, create_train_state(model, opt, jax.random.PRNGKey(0)))
    step2d = make_train_step(model, opt, mesh=mesh)
    _, m2 = step2d(
        state_r, shard_batch_spatial(mesh, strong), shard_batch_spatial(mesh, weak),
        None, jax.random.PRNGKey(7),
    )
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5)
