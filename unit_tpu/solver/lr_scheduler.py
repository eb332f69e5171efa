"""Extra LR schedules.

``CyclicCosineDecayLR`` mirrors /root/reference/solver/lr_scheduler.py:6-89
(defined there but unused by the shipped configs — provided for parity): an
initial cosine decay followed by fixed-length (or geometrically growing) cosine
restart cycles, optionally warm-started.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp


def cyclic_cosine_decay(
    base_lr: float,
    init_decay_epochs: int,
    min_decay_lr: float,
    restart_interval: Optional[int] = None,
    restart_interval_multiplier: Optional[float] = None,
    restart_lr: Optional[float] = None,
    warmup_epochs: Optional[int] = None,
    warmup_start_lr: Optional[float] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def cos_interp(start, end, frac):
        return end + (start - end) * (1 + jnp.cos(jnp.pi * frac)) / 2

    warmup = warmup_epochs or 0

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        # warmup
        w_lr = (
            cos_interp(warmup_start_lr or 0.0, base_lr, 1.0 - it / max(warmup, 1))
            if warmup
            else base_lr
        )
        t = jnp.maximum(it - warmup, 0.0)
        main_lr = cos_interp(
            base_lr, min_decay_lr, jnp.clip(t / init_decay_epochs, 0.0, 1.0)
        )
        if restart_interval is None:
            out = main_lr
        else:
            tr = t - init_decay_epochs
            r_lr0 = restart_lr if restart_lr is not None else base_lr
            if restart_interval_multiplier is None:
                frac = (tr % restart_interval) / restart_interval
            else:
                # geometric cycles: solved in closed form from the cycle index
                m = restart_interval_multiplier
                eps = 1e-9
                cyc = jnp.floor(
                    jnp.log(jnp.maximum(tr * (m - 1) / restart_interval + 1, 1.0))
                    / math.log(m + eps)
                )
                start = restart_interval * (m ** cyc - 1) / (m - 1)
                length = restart_interval * m ** cyc
                frac = jnp.clip((tr - start) / length, 0.0, 1.0)
            restart_val = cos_interp(r_lr0, min_decay_lr, frac)
            out = jnp.where(tr >= 0, restart_val, main_lr)
        return jnp.where(it < warmup, w_lr, out)

    return schedule
