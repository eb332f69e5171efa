"""Prefetcher ordering/exhaustion + the weak-only optimizer freeze phase."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unit_tpu.config import get_cfg
from unit_tpu.data.loader import Prefetcher
from unit_tpu.solver import build_optimizer, modify_for_weak_only


def test_prefetcher_preserves_order_and_stops():
    items = list(range(17))
    out = list(Prefetcher(iter(items), depth=3))
    assert out == items


def test_prefetcher_overlaps_producer():
    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            yield i

    pf = Prefetcher(iter(slow_gen()), depth=4)
    time.sleep(0.3)  # producer fills the queue in the background
    t0 = time.perf_counter()
    assert list(pf) == [0, 1, 2, 3]
    assert time.perf_counter() - t0 < 0.15  # items were already buffered


def test_weak_only_phase_freezes_supervised_branch():
    cfg = get_cfg()
    params = {
        "backbone": {"stem": {"kernel": jnp.ones((2, 2))}},
        "rpn_head": {"conv": {"kernel": jnp.ones((2, 2))}},
        "box_head": {"res5": {"kernel": jnp.ones((2, 2))}},
        "weak_box_head": {"res5": {"kernel": jnp.ones((2, 2))}},
        "supervised": {"cls_score_delta": {"kernel": jnp.ones((2, 2))}},
        "weak_detector": {"classifier_stream": {"kernel": jnp.ones((2, 2))}},
    }
    opt = modify_for_weak_only(cfg, params)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)

    def moved(path):
        sub = updates
        for k in path:
            sub = sub[k]
        return bool(np.any(np.asarray(sub["kernel"]) != 0.0))

    # frozen during TRAIN_ONLY_WEAK (reference solver/build.py:117-186)
    assert not moved(["backbone", "stem"])
    assert not moved(["rpn_head", "conv"])
    assert not moved(["box_head", "res5"])
    assert not moved(["supervised", "cls_score_delta"])
    # the weak branch still trains
    assert moved(["weak_detector", "classifier_stream"])
    assert moved(["weak_box_head", "res5"])


def test_prefetcher_close_stops_thread():
    """Abandoned/closed iterators must stop their producer thread (round-2
    verdict: a daemon thread kept loading images after its test's tmpdir was
    deleted)."""

    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    pf = Prefetcher(iter(infinite()), depth=2)
    assert next(pf) == 0
    pf.close()
    assert not pf.thread.is_alive()
    # a closed prefetcher raises StopIteration instead of blocking
    try:
        next(pf)
        raised = False
    except StopIteration:
        raised = True
    assert raised


def test_prefetcher_forwards_producer_exception():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    pf = Prefetcher(iter(bad_gen()))
    assert next(pf) == 1
    try:
        next(pf)
        raised = False
    except ValueError as e:
        raised = "boom" in str(e)
    assert raised
    pf.close()


def test_prefetcher_context_manager():
    with Prefetcher(iter(range(100)), depth=1) as pf:
        assert next(pf) == 0
    assert not pf.thread.is_alive()
