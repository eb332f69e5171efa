#!/usr/bin/env python
"""Inference throughput of the flagship detector on the attached TPU.

Measures the batched non-TTA predict path (the reference is batch-1 only,
rcnn.py:494; ours batches via TPU.EVAL_BATCH_SIZE) on synthetic 800x1344
inputs and reports img/s + wall-clock per 1k images for batch sizes 1 and 4.

    python scripts/bench_eval.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4])
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _model_config
    from unit_tpu.engine import make_predict_fn
    from unit_tpu.models import WSRCNN

    model = WSRCNN(mc=_model_config(tiny=False))
    h, w = 800, 1344
    rng = np.random.RandomState(0)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
            jnp.asarray([[256, 256]], jnp.float32),
        )
    )()
    predict = make_predict_fn(model)

    for b in args.batches:
        imgs = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32) * 255
        sizes = jnp.asarray([[h, w]] * b, jnp.float32)
        det = predict(variables["params"], imgs, sizes)
        float(np.asarray(det.scores).sum())  # real host fetch = hard sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            det = predict(variables["params"], imgs, sizes)
        float(np.asarray(det.scores).sum())
        dt = time.perf_counter() - t0
        ips = b * args.iters / dt
        print(
            f"eval batch {b}: {ips:.2f} img/s  "
            f"({1000.0 / ips:.1f} s per 1k images, {dt / args.iters * 1e3:.1f} ms/batch)"
        )


if __name__ == "__main__":
    main()
