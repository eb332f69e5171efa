"""Training-loop resume and preemption semantics.

The reference's d2 loop runs ``range(start_iter, max_iter)`` so ``--resume``
continues to the SAME total iteration count; and production TPU jobs receive
SIGTERM ahead of preemption — the loop must exit cleanly after the in-flight
step so the runner can checkpoint (unit_tpu addition; the reference loses
everything since the last periodic save on eviction).
"""

import os
import signal
import threading

from unit_tpu.engine.train import TrainerBase


class _FakeState:
    def __init__(self, step):
        self.step = step


def _loop_only_trainer(start_step):
    """A TrainerBase whose run_step is a counter — tests the loop logic
    (start-iteration arithmetic, stop flag, hook protocol) in isolation."""
    t = TrainerBase.__new__(TrainerBase)
    t._state = _FakeState(start_step)
    t.stop_requested = False
    t._host_step = start_step
    steps = []

    def run_step():
        t._host_step += 1
        t._state.step += 1
        steps.append(t._host_step)
        return {"total_loss": 0.0}

    t.run_step = run_step
    return t, steps


def test_train_runs_to_max_iter_from_scratch():
    t, steps = _loop_only_trainer(0)
    t.train(5)
    assert steps == [1, 2, 3, 4, 5]


def test_train_resumes_from_restored_step():
    # restored at step 3 of a 5-iter schedule: exactly 2 MORE steps, not 5
    t, steps = _loop_only_trainer(3)
    t.train(5)
    assert steps == [4, 5]
    assert t.state.step == 5


def test_train_noop_when_already_complete():
    t, steps = _loop_only_trainer(7)
    t.train(5)
    assert steps == []


def test_request_stop_exits_after_current_step():
    t, steps = _loop_only_trainer(0)

    def hook(step, metrics, trainer):
        if step == 2:
            trainer.request_stop()

    t.train(10, hooks=[hook])
    assert steps == [1, 2]
    assert t.stop_requested


def test_sigterm_mid_loop_stops_training():
    """A real SIGTERM delivered mid-loop (the runner installs this handler)
    flips the stop flag and the loop exits after the in-flight step."""
    t, steps = _loop_only_trainer(0)
    prev = signal.signal(signal.SIGTERM, lambda signum, frame: t.request_stop())
    try:

        def hook(step, metrics, trainer):
            if step == 3:
                os.kill(os.getpid(), signal.SIGTERM)

        assert threading.current_thread() is threading.main_thread()
        t.train(100, hooks=[hook])
    finally:
        signal.signal(signal.SIGTERM, prev)
    # the signal lands during/just after step 3's hook; python delivers it at
    # the next bytecode boundary — the loop must stop within one extra step
    assert len(steps) <= 4
    assert t.stop_requested
