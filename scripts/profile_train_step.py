#!/usr/bin/env python
"""Capture a jax.profiler device trace of the flagship train step on the TPU.

Works through the axon tunnel (produces vm.trace.json.gz with real
/device:TPU:0 lanes).  Pair with scripts/analyze_trace.py:

    python scripts/profile_train_step.py --out /tmp/step_trace
    python scripts/analyze_trace.py /tmp/step_trace

Round-5: supports the deployment regimes from BASELINE.md's batch-scaling
table — ``--batch 8`` traces the full-recipe global-batch-8 step on one chip,
``--depth 101 --batch 4 --grad-accum 2`` the R-101 accumulated regime, and
``--steady N`` first trains N real-lr steps over rotating batches (bench.py's
steady-state protocol) so the traced step sees trained-RPN proposal sizes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/step_trace")
    ap.add_argument("--steps", type=int, default=3, help="traced steps")
    ap.add_argument("--batch", type=int, default=2,
                    help="strong (and weak) images per microbatch")
    ap.add_argument("--depth", type=int, default=50, choices=(50, 101))
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--steady", type=int, default=0,
                    help="real-lr warmup steps before tracing (0 = trace the "
                         "from-init regime, rounds 1-3 behavior)")
    args = ap.parse_args()

    import dataclasses

    import jax

    from unit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _bench_optimizer, _model_config
    from bench import _make_batches
    from unit_tpu.engine import create_train_state, make_train_step
    from unit_tpu.models import WSRCNN

    mc = _model_config(tiny=False)
    if args.depth != mc.depth:
        mc = dataclasses.replace(mc, depth=args.depth)
    model = WSRCNN(mc=mc)
    opt = _bench_optimizer(1e-6, momentum=0.9, steady_after=args.steady)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 256, 256, 3))
    batches = _make_batches(mc, n_batches=4, b=args.batch)
    if args.grad_accum > 1:
        n = len(batches)
        batches = [
            tuple(
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *(batches[(i + j) % n][s] for j in range(args.grad_accum)),
                )
                for s in range(2)
            )
            for i in range(n)
        ]
        step = make_train_step(model, opt, grad_accum=args.grad_accum)
    else:
        step = make_train_step(model, opt)

    t0 = time.time()
    state, metrics = step(state, *batches[0], None, jax.random.PRNGKey(1))
    # host fetch of a scalar is the only reliable barrier through the tunnel
    float(np.asarray(metrics["total_loss"]))
    print(f"warmup compile {time.time() - t0:.0f}s", flush=True)

    if args.steady:
        t0 = time.time()
        for i in range(1, args.steady):
            state, metrics = step(
                state, *batches[i % len(batches)], None, jax.random.PRNGKey(200 + i)
            )
        tl = float(np.asarray(metrics["total_loss"]))
        assert tl == tl, "steady warmup diverged to NaN"
        print(f"steady warmup {args.steady} steps {time.time() - t0:.0f}s "
              f"(loss {tl:.3f})", flush=True)

    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        state, metrics = step(
            state, *batches[i % len(batches)], None, jax.random.PRNGKey(9000 + i)
        )
    float(np.asarray(metrics["total_loss"]))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}", flush=True)


if __name__ == "__main__":
    main()
