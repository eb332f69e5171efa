"""End-to-end preemption -> checkpoint -> --resume through the CLI runner.

A SIGTERM mid-training (what TPU pods receive ahead of eviction) must stop
the loop after the in-flight step, write a checkpoint of that exact step,
and a subsequent ``--resume`` invocation must continue from there and stop
at SOLVER.MAX_ITER total iterations (the reference's d2 loop semantics,
``range(start_iter, max_iter)``), not MAX_ITER additional ones.
"""

import os
import signal
import types

import numpy as np
import pytest

from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.engine import runner
from tests.test_data import synthetic_voc, _fake_image_loader  # noqa: F401
from tests.test_engine_integration import _tiny_cfg


def _args(resume=False):
    return types.SimpleNamespace(
        config_file="", eval_only=False, resume=resume, num_gpus=1,
        data_root=None, dist=False, opts=[],
    )


@pytest.mark.slow
def test_sigterm_checkpoints_and_resume_completes(synthetic_voc, monkeypatch, tmp_path):
    DatasetCatalog.clear()
    cfg = _tiny_cfg(synthetic_voc)
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 100  # no periodic saves in range
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.AUG.ENABLED = False
    RegisterVOC(cfg, synthetic_voc).register_all()

    monkeypatch.setattr(runner, "setup", lambda args: cfg)
    # no JPEGs on disk: route every loader through the synthetic image maker
    # (loader.py imports load_image_bgr lazily from transforms, so patching
    # the transforms module covers every call site)
    import unit_tpu.data.transforms as T

    def _fake_load(path):
        rng = np.random.RandomState(abs(hash(path)) % 2**31)
        return rng.rand(100, 120, 3).astype(np.float32) * 255

    monkeypatch.setattr(T, "load_image_bgr", _fake_load)

    real_hook = runner.MetricsHook

    class KillAtStep2(real_hook):
        def __call__(self, step, metrics, trainer):
            super().__call__(step, metrics, trainer)
            if step == 2:
                os.kill(os.getpid(), signal.SIGTERM)

    monkeypatch.setattr(runner, "MetricsHook", KillAtStep2)
    assert runner.run(_args()) is None  # preempted: no final eval

    from unit_tpu.checkpoint import Checkpointer

    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    assert ckpt.latest_step() == 2  # the preempted step, not a period multiple

    # resume: must run steps 3..4 ONLY (to MAX_ITER total), then the final eval
    seen = []

    class Recorder(real_hook):
        def __call__(self, step, metrics, trainer):
            super().__call__(step, metrics, trainer)
            seen.append(step)

    monkeypatch.setattr(runner, "MetricsHook", Recorder)
    # exact resume also fast-forwards every training stream past the batches
    # the preempted run consumed (loader-level bit-exactness is covered by
    # tests/test_loader_fast_forward.py; this asserts the runner wiring)
    from unit_tpu.data.loader import StreamLoader

    ff_calls = []
    real_ff = StreamLoader.fast_forward

    def recording_ff(self, n):
        ff_calls.append(n)
        return real_ff(self, n)

    monkeypatch.setattr(StreamLoader, "fast_forward", recording_ff)
    results = runner.run(_args(resume=True))
    assert seen == [3, 4]
    assert results is not None and "bbox" in results
    assert ff_calls and all(n == 2 for n in ff_calls)  # both streams skip to step 2
