"""Metrics storage and writers.

Rebuild of the reference's EventStorage/PeriodicWriter observability
(SURVEY.md §5 "Metrics / logging"): scalars accumulated per step, written
periodically to the terminal and to ``metrics.json`` (one JSON line per step,
matching d2's JSONWriter format).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional

logger = logging.getLogger("unit_tpu")


class EventStorage:
    def __init__(self, window_size: int = 20):
        self._history = defaultdict(lambda: deque(maxlen=window_size))
        self._latest: Dict[str, float] = {}
        self.iter = 0

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            v = float(v)
            self._history[k].append(v)
            self._latest[k] = v

    def median(self, key: str) -> float:
        vals = sorted(self._history[key])
        return vals[len(vals) // 2] if vals else float("nan")

    def latest(self) -> Dict[str, float]:
        return dict(self._latest)


class JSONWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, step: int, storage: EventStorage):
        rec = {"iteration": step}
        rec.update(storage.latest())
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class ConsoleWriter:
    def __init__(self, max_iter: Optional[int] = None):
        self.max_iter = max_iter
        self._t0 = time.perf_counter()
        self._first_step: Optional[int] = None

    def write(self, step: int, storage: EventStorage):
        # rate from the first step THIS writer saw: a resumed run starts at
        # step N, and elapsed/step would undercount per-iter time by N/steps
        if self._first_step is None:
            self._first_step = step
            self._t0 = time.perf_counter()
        elapsed = time.perf_counter() - self._t0
        done = max(step - self._first_step, 1)
        per_it = elapsed / done
        eta = (self.max_iter - step) * per_it if self.max_iter else None
        parts = [f"iter {step}"]
        if eta is not None:
            parts.append(f"eta {eta/60:.1f}m")
        for k, v in sorted(storage.latest().items()):
            parts.append(f"{k} {storage.median(k):.4g}")
        logger.info("  ".join(parts))


def print_csv_format(results: Dict, logger_=None):
    """CSV-style result dump (engine/defaults.py:243-244 parity): one
    `task,metric,value` line per metric, copy-paste friendly."""
    log = (logger_ or logger).info
    for task, metrics in results.items():
        if not isinstance(metrics, dict):
            log("%s,%s", task, metrics)
            continue
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                log("csv: %s,%s,%.4f", task, k, v)


class TensorBoardWriter:
    """Optional TensorBoard scalars (d2 PeriodicWriter parity); no-op if the
    torch SummaryWriter is unavailable."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:  # pragma: no cover
            self._w = None

    def write(self, step: int, storage: EventStorage):
        if self._w is None:
            return
        for k, v in storage.latest().items():
            self._w.add_scalar(k, v, step)

    def close(self):
        if self._w is not None:
            self._w.close()


class MetricsHook:
    """Trainer hook: accumulate metrics + periodic writes."""

    def __init__(self, output_dir: str, period: int = 20, max_iter: Optional[int] = None,
                 tensorboard: bool = False, lr_fn=None):
        self.storage = EventStorage()
        self.period = period
        self.lr_fn = lr_fn  # step -> current lr (d2 logs lr per step)
        self._buf: list = []  # (step, metrics) awaiting resolution
        self.writers = [
            ConsoleWriter(max_iter),
            JSONWriter(os.path.join(output_dir, "metrics.json")),
        ]
        if tensorboard:
            self.writers.append(TensorBoardWriter(os.path.join(output_dir, "tb")))

    def __call__(self, step: int, metrics: dict, trainer):
        # Buffer until the write boundary: ``metrics`` may be a LazyMetrics
        # whose device->host fetch is still in flight (engine/train.py); by
        # the time the period closes every buffered copy has landed, so the
        # whole window resolves without a synchronous round trip per step.
        # Written output is bit-identical to per-step accumulation — the
        # storage window sees the same values in the same order.
        self._buf.append((step, metrics))
        if step % self.period == 0:
            for s, m in self._buf:
                self.storage.iter = s
                self.storage.put_scalars(**m)
                if self.lr_fn is not None:
                    self.storage.put_scalars(lr=float(self.lr_fn(s)))
            self._buf.clear()
            for w in self.writers:
                w.write(step, self.storage)
