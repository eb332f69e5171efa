"""Profiling hooks (jax.profiler) — SURVEY.md §5 'Tracing / profiling'.

The reference only records wall-clock (`data_time`, IterationTimer); the TPU
stack exposes real device traces: a trace context manager for ad-hoc capture, a
trainer hook that captures a window of steps, and a programmatic profiler-server
starter for TensorBoard's live profiling.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Optional

import jax

logger = logging.getLogger("unit_tpu")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / xprof."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", logdir)


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


class ProfileHook:
    """Trainer hook: trace steps [start, start+num_steps)."""

    def __init__(self, logdir: str, start: int = 10, num_steps: int = 3):
        self.logdir = logdir
        self.start = start
        self.stop = start + num_steps
        self._active = False

    def __call__(self, step: int, metrics: dict, trainer):
        if step == self.start and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= self.stop and self._active:
            self.close()

    def close(self):
        """Stop an in-flight trace (e.g. training ended inside the window)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profile trace written to %s", self.logdir)
