"""Per-chip batch-scaling probe: R-C4 train-step throughput vs batch size.

The reference trains IMS_PER_BATCH 8 over 4 GPUs = 2 strong images per device
(/root/reference/configs/VOC/VOC-RCNN-101-C4-split1.yaml:42,
 /root/reference/data/build.py:110-122) — its per-GPU batch is memory-bound.
A v5e chip has HBM headroom beyond that; this probe measures the same
two-stream train step at b strong + b weak images per chip for b in
--batches, with a shortened warmup (the relative b-to-b comparison is what
matters; the absolute steady-state headline stays in bench.py).

Usage: python scripts/bench_batch_scaling.py [--batches 2 4] [--depth 101]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def measure(depth: int, b: int, warmup: int, n_iter: int = 10,
            grad_accum: int = 1) -> float:
    import dataclasses

    from __graft_entry__ import _bench_optimizer, _model_config
    from bench import _make_batches
    from unit_tpu.engine import create_train_state, make_train_step
    from unit_tpu.models import WSRCNN

    mc = _model_config(tiny=False)
    if depth != mc.depth:
        mc = dataclasses.replace(mc, depth=depth)
    model = WSRCNN(mc=mc)
    opt = _bench_optimizer(1e-6, momentum=0.9, steady_after=warmup)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 256, 256, 3))
    batches = _make_batches(mc, b=b)
    if grad_accum > 1:
        # A microbatches of b+b per optimizer step (leading scan axis): the
        # same effective batch as a flat b*A+b*A step but with one
        # microbatch's activations live at a time — probes whether running
        # at the per-microbatch working-set sweet spot beats the flat step
        n = len(batches)
        batches = [
            tuple(
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *(batches[(i + j) % n][s] for j in range(grad_accum)),
                )
                for s in range(2)
            )
            for i in range(n)
        ]
    step = make_train_step(model, opt, grad_accum=grad_accum)

    metrics = None
    for i in range(warmup):
        state, metrics = step(
            state, *batches[i % len(batches)], None, jax.random.PRNGKey(200 + i)
        )
    tl = float(np.asarray(metrics["total_loss"]))
    assert tl == tl, "warmup diverged to NaN"

    t0 = time.perf_counter()
    for i in range(n_iter):
        state, metrics = step(
            state, *batches[i % len(batches)], None, jax.random.PRNGKey(9000 + i)
        )
    float(np.asarray(metrics["total_loss"]))  # host fetch = hard sync
    return 2 * b * grad_accum * n_iter / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--grad-accum", type=int, default=1)
    args = ap.parse_args()
    for b in args.batches:
        try:
            v = measure(args.depth, b, args.warmup, grad_accum=args.grad_accum)
        except Exception as e:  # OOM etc: report and continue
            print(f"b={b}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        ga = f" x GRAD_ACCUM {args.grad_accum}" if args.grad_accum > 1 else ""
        print(
            f"b={b}{ga} ({2 * b * args.grad_accum} imgs/step, "
            f"R-{args.depth}-C4): {v:.2f} img/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
