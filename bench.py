"""Benchmark: training throughput (images/sec/chip) of the flagship UniT detector.

Runs the full two-stream (strong query + weak classifier) R-C4 training step —
backbone x2, RPN + losses, ROIAlign over 512+512 proposals, Res5 box heads,
supervised CE/box losses, MIL + 3x OICR losses, SGD update — on one chip with
synthetic data at the reference's input resolution, and prints one JSON line
per model (LAST line = the flagship R-101-C4 headline).

Measured at STEADY STATE (round 3): the step first trains 400 iterations at a
real learning rate over 4 rotating synthetic batches so the RPN reaches its
production proposal-size regime (verified: post-NMS proposal sqrt-area
p10/p50/p90 = 91/125/183 px, the trained-RPN tier of BASELINE.md's ROIAlign
regime microbenchmarks), then times with the SAME compiled program at a tiny
lr.  A random-init RPN instead emits a degenerate box mix that misprices
ROIAlign; that from-init number is still reported as ``init_regime_value``
for continuity with rounds 1-2.

vs_baseline compares against the reference stack's measured/estimated
~2.5 images/sec/GPU for the same recipe (Detectron2 R-C4 at IMS_PER_BATCH 8
over 4 GPUs; the reference repo publishes no numbers — see BASELINE.md).

Two regimes per model (round 4): ``value`` is the 2-strong + 2-weak per-chip
batch (the per-GPU share of the 4-GPU recipe — the like-for-like per-device
comparison), ``global_batch8_value`` runs the FULL recipe batch (8 strong +
8 weak) on one chip — the natural single-chip deployment (BASELINE.md
"Batch scaling" table for the b-sweep).
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: full-step compiles take minutes through the
# remote-compile tunnel; cache hits make repeat benchmark runs start in seconds
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from unit_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC_PER_CHIP = 2.5  # documented assumption, BASELINE.md
WARMUP_STEPS = 400  # real-lr steps to reach the trained-RPN proposal regime


def _make_batches(mc, n_batches=4, b=2, h=800, w=1344):
    """Distinct pre-staged device batches: rotating them during warmup makes
    the RPN learn the GT box-size DISTRIBUTION (30-230 px, VOC-like) without
    memorizing one layout into unrealistically tight proposals."""
    rng = np.random.RandomState(0)
    base = np.asarray(mc.base_ids)
    out = []
    for _ in range(n_batches):
        boxes = np.zeros((b, 8, 4), np.float32)
        boxes[..., 0] = rng.rand(b, 8) * (w - 260)
        boxes[..., 1] = rng.rand(b, 8) * (h - 260)
        boxes[..., 2:] = boxes[..., :2] + 30 + rng.rand(b, 8, 2) * 200
        strong = {
            "image": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32) * 255,
            # base-class ids only: base training's supervised stream never
            # contains novel-class boxes (VOC split-1 removes them); novel GT
            # would hit the -inf novel-logit mask -> a clamped ~1e6 CE term
            "gt_boxes": jnp.asarray(boxes),
            "gt_classes": jnp.asarray(
                base[rng.randint(0, len(base), (b, 8))], jnp.int32
            ),
            "gt_valid": jnp.ones((b, 8), bool),
            "image_size": jnp.asarray([[h, w]] * b, jnp.float32),
        }
        labels = np.zeros((b, 20), np.float32)
        labels[np.arange(b)[:, None], rng.randint(0, 20, (b, 3))] = 1.0
        weak = {
            "image": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32) * 255,
            "labels": jnp.asarray(labels),
            "image_size": jnp.asarray([[h, w]] * b, jnp.float32),
        }
        out.append((jax.device_put(strong), jax.device_put(weak)))
    return out


def _measure(depth: int, global_batch: int = 8):
    """-> (steady_state_img_per_s, init_regime_img_per_s, global_batch_img_per_s).

    The first two numbers are the rounds-1..3 2-strong + 2-weak series (the
    per-GPU share of the reference's 4-GPU IMS_PER_BATCH-8 recipe — the
    like-for-like per-chip comparison).  The third runs the SAME warmed
    parameters with the full recipe batch on one chip (``global_batch`` strong
    + ``global_batch`` weak images per step) — the natural single-chip
    deployment regime (BASELINE.md "Batch scaling").
    """
    from __graft_entry__ import _bench_optimizer, _model_config
    from unit_tpu.engine import create_train_state, make_train_step
    from unit_tpu.models import WSRCNN
    import dataclasses

    mc = _model_config(tiny=False)
    if depth != mc.depth:
        mc = dataclasses.replace(mc, depth=depth)
    model = WSRCNN(mc=mc)
    opt = _bench_optimizer(1e-6, momentum=0.9, steady_after=WARMUP_STEPS)

    # per-chip batch: 2 strong + 2 weak images at the 800-canvas
    b = 2
    state = create_train_state(model, opt, jax.random.PRNGKey(0), (1, 256, 256, 3))
    batches = _make_batches(mc, b=b)

    step = make_train_step(model, opt)
    state, metrics = step(state, *batches[0], None, jax.random.PRNGKey(1))
    float(np.asarray(metrics["total_loss"]))  # host fetch = hard sync

    n_iter = 10

    def timed(key0, tbatches, tb, step_fn=None):
        nonlocal state
        step_fn = step_fn or step
        t0 = time.perf_counter()
        for i in range(n_iter):
            state, metrics = step_fn(
                state, *tbatches[i % len(tbatches)], None, jax.random.PRNGKey(key0 + i)
            )
        # a real host fetch is the only reliable barrier on remote-attached
        # TPUs (block_until_ready can return early through the tunnel)
        float(np.asarray(metrics["total_loss"]))
        return 2 * tb * n_iter / (time.perf_counter() - t0)

    init_regime = timed(100, batches, b)  # lr ~0 here: random-init regime

    for i in range(1 + n_iter, WARMUP_STEPS):
        state, metrics = step(
            state, *batches[i % len(batches)], None, jax.random.PRNGKey(200 + i)
        )
    tl = float(np.asarray(metrics["total_loss"]))
    assert tl == tl, "warmup diverged to NaN"

    steady = timed(9000, batches, b)

    # Full-recipe batch on one chip, same warmed params (the step re-traces for
    # the new shapes; the lr schedule is already past steady so the trained RPN
    # regime is preserved).  Per-depth regime choice from the batch-scaling
    # sweep (BASELINE.md): R-50 runs the flat 8+8 step (monotone gains);
    # R-101 peaks at b=4, so its full-recipe step is GRAD_ACCUM 2 microbatches
    # of 4+4 — the same effective batch at the per-microbatch working-set
    # sweet spot (26.52 vs 26.05 img/s flat, measured round 4).
    batch_full = None
    if global_batch and global_batch != b:
        try:
            accum, b_micro = (2, 4) if depth == 101 else (1, global_batch)
            batches_g = _make_batches(mc, n_batches=2, b=b_micro)
            step_g = step
            if accum > 1:
                step_g = make_train_step(model, opt, grad_accum=accum)
                n = len(batches_g)
                batches_g = [
                    tuple(
                        jax.tree.map(
                            lambda *xs: jnp.stack(xs),
                            *(batches_g[(i + j) % n][s] for j in range(accum)),
                        )
                        for s in range(2)
                    )
                    for i in range(n)
                ]
            state, metrics = step_g(state, *batches_g[0], None, jax.random.PRNGKey(2))
            tl = float(np.asarray(metrics["total_loss"]))
            assert tl == tl, "global-batch step produced NaN"
            batch_full = timed(9500, batches_g, b_micro * accum, step_fn=step_g)
        except Exception as e:  # HBM OOM etc: the headline series must survive
            print(f"# global-batch-{global_batch} series failed: {e!r}", flush=True)
            batch_full = None
    return steady, init_regime, batch_full


def main():
    # R-50-C4 series (rounds 1-2 continuity)
    v50, v50_init, v50_gb = _measure(50)
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(v50, 3),
                "unit": "img/s",
                "vs_baseline": round(v50 / REFERENCE_IMG_PER_SEC_PER_CHIP, 3),
                "init_regime_value": round(v50_init, 3),
                "global_batch8_value": round(v50_gb, 3) if v50_gb else None,
            }
        ),
        flush=True,
    )
    # flagship R-101-C4 (the config BASELINE.json's metric names:
    # configs/VOC/VOC-RCNN-101-C4-split1.yaml) — LAST line is the headline
    v101, v101_init, v101_gb = _measure(101)
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_r101_c4",
                "value": round(v101, 3),
                "unit": "img/s",
                "vs_baseline": round(v101 / REFERENCE_IMG_PER_SEC_PER_CHIP, 3),
                "init_regime_value": round(v101_init, 3),
                "global_batch8_value": round(v101_gb, 3) if v101_gb else None,
                "r50_c4_value": round(v50, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
