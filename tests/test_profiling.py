"""jax.profiler plumbing: trace context manager + trainer ProfileHook."""

import glob
import os

import jax
import jax.numpy as jnp

from unit_tpu.utils.profiling import ProfileHook, trace


def _traced_files(logdir):
    return glob.glob(os.path.join(logdir, "plugins", "profile", "*", "*"))


def test_trace_context_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x * 2).sum())
    f(jnp.ones((8, 8))).block_until_ready()
    with trace(logdir):
        f(jnp.ones((8, 8))).block_until_ready()
    assert _traced_files(logdir), "no profile artifacts written"


def test_profile_hook_window(tmp_path):
    logdir = str(tmp_path / "hook")
    hook = ProfileHook(logdir, start=2, num_steps=2)
    f = jax.jit(lambda x: x + 1)
    for step in range(6):
        f(jnp.ones((4,))).block_until_ready()
        hook(step, {}, trainer=None)
    assert not hook._active
    assert _traced_files(logdir), "hook wrote no profile artifacts"
