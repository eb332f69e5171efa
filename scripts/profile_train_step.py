#!/usr/bin/env python
"""Capture a jax.profiler device trace of the flagship train step on the TPU.

Works through the axon tunnel (produces vm.trace.json.gz with real
/device:TPU:0 lanes).  Pair with scripts/analyze_trace.py:

    python scripts/profile_train_step.py --out /tmp/step_trace
    python scripts/analyze_trace.py /tmp/step_trace
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
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _bench_optimizer, _model_config
    from unit_tpu.engine import create_train_state, make_train_step
    from unit_tpu.models import WSRCNN

    model = WSRCNN(mc=_model_config(tiny=False))
    opt = _bench_optimizer(1e-6, momentum=0.9)  # recipe freeze semantics
    b, h, w = 2, 800, 1344
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 256, 256, 3))
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, 8, 4), np.float32)
    boxes[..., :2] = rng.rand(b, 8, 2) * 300
    boxes[..., 2:] = boxes[..., :2] + 30 + rng.rand(b, 8, 2) * 200
    strong = {
        "image": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32) * 255,
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 15, (b, 8)), jnp.int32),
        "gt_valid": jnp.ones((b, 8), bool),
        "image_size": jnp.asarray([[h, w]] * b, jnp.float32),
    }
    labels = np.zeros((b, 20), np.float32)
    labels[:, [1, 7, 11]] = 1.0
    weak = {
        "image": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32) * 255,
        "labels": jnp.asarray(labels),
        "image_size": jnp.asarray([[h, w]] * b, jnp.float32),
    }
    step = make_train_step(model, opt)
    t0 = time.time()
    state, metrics = step(state, strong, weak, None, jax.random.PRNGKey(1))
    # host fetch of a scalar is the only reliable barrier through the tunnel
    float(np.asarray(metrics["total_loss"]))
    print(f"warmup {time.time() - t0:.0f}s", flush=True)

    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        state, metrics = step(state, strong, weak, None, jax.random.PRNGKey(2 + i))
    float(np.asarray(metrics["total_loss"]))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}", flush=True)


if __name__ == "__main__":
    main()
