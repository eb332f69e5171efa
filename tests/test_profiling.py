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


def test_profile_hook_close_mid_window(tmp_path):
    """Training ending inside the trace window must still finalize the trace
    (the runner calls close() in its finally; TPU.PROFILE_START_STEP wiring)."""
    logdir = str(tmp_path / "cut")
    hook = ProfileHook(logdir, start=1, num_steps=100)
    f = jax.jit(lambda x: x * 3)
    for step in range(3):  # ends long before start+num_steps
        f(jnp.ones((4,))).block_until_ready()
        hook(step, {}, trainer=None)
    assert hook._active
    hook.close()
    assert not hook._active
    assert _traced_files(logdir), "close() did not finalize the trace"
    hook.close()  # idempotent
