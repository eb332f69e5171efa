"""EventStorage/writers and the periodic checkpoint+eval hook."""

import json
import os

import numpy as np

from unit_tpu.utils.events import EventStorage, JSONWriter, MetricsHook, print_csv_format
from unit_tpu.checkpoint import Checkpointer, PeriodicCheckpointerWithEval


def test_event_storage_median_and_latest():
    s = EventStorage(window_size=3)
    for v in [1.0, 5.0, 3.0]:
        s.put_scalars(loss=v)
    assert s.latest()["loss"] == 3.0
    assert s.median("loss") == 3.0
    s.put_scalars(loss=100.0)  # window drops the oldest
    assert s.median("loss") == 5.0


def test_json_writer_lines(tmp_path):
    path = str(tmp_path / "metrics.json")
    w = JSONWriter(path)
    s = EventStorage()
    s.put_scalars(loss=1.5, ap=0.3)
    w.write(10, s)
    s.put_scalars(loss=1.2)
    w.write(20, s)
    w.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["iteration"] == 10 and lines[0]["loss"] == 1.5
    assert lines[1]["iteration"] == 20 and lines[1]["loss"] == 1.2


def test_metrics_hook_periodic(tmp_path):
    hook = MetricsHook(str(tmp_path), period=2)
    for step in range(1, 5):
        hook(step, {"loss": float(step)}, trainer=None)
    lines = list(open(os.path.join(str(tmp_path), "metrics.json")))
    assert len(lines) == 2  # steps 2 and 4


class _FakeTrainer:
    def __init__(self, state):
        self.state = state


def test_periodic_checkpointer_with_eval(tmp_path):
    ckpt = Checkpointer(str(tmp_path), max_to_keep=2)
    evals = []

    def eval_fn(state):
        evals.append(1)
        return {"bbox": {"AP50": 40.0 + 10 * len(evals)}}

    hook = PeriodicCheckpointerWithEval(
        ckpt, eval_fn, eval_period=2, checkpoint_period=2
    )
    tr = _FakeTrainer({"w": np.ones(2)})
    for step in range(1, 5):
        hook(step, {}, tr)
    assert len(evals) == 2                      # steps 2, 4
    assert ckpt.latest_step() == 4              # periodic saves happened
    assert ckpt.best_info["AP50"] == 60.0       # best tracked from eval results
    assert ckpt.best_info["iteration"] == 4


def test_print_csv_format_no_crash(caplog):
    print_csv_format({"bbox": {"AP50": 42.0, "novel_mean": None}})
