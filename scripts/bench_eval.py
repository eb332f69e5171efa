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
    ap.add_argument(
        "--tta", action="store_true",
        help="also time the full TTA protocol (TEST.AUG defaults: 5 scales x "
        "flip = 10 variants, grouped flip-pair batching) per image",
    )
    ap.add_argument(
        "--fold-bn", action="store_true",
        help="fold FrozenBN into conv kernels before timing (TPU.FOLD_BN_AT_EVAL)",
    )
    ap.add_argument(
        "--wide-canvas", action="store_true",
        help="pad every TTA variant to TEST.AUG.MAX_SIZE on the long side "
             "(the pre-round-5 behavior) instead of the tight per-scale canvas",
    )
    ap.add_argument(
        "--tta-topk", type=int, default=0,
        help="re-score only the top-K canonical proposals per variant "
             "(0 = all, the reference protocol)",
    )
    ap.add_argument("--depth", type=int, default=50, choices=(50, 101))
    ap.add_argument("--trace", default="",
                    help="capture a device trace of the timed loop to this dir")
    args = ap.parse_args()

    import jax

    from unit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _model_config
    from unit_tpu.engine import make_predict_fn
    from unit_tpu.models import WSRCNN

    import dataclasses

    mc = _model_config(tiny=False)
    if args.depth != mc.depth:
        mc = dataclasses.replace(mc, depth=args.depth)
    model = WSRCNN(mc=mc)
    h, w = 800, 1344
    rng = np.random.RandomState(0)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
            jnp.asarray([[256, 256]], jnp.float32),
        )
    )()
    predict = make_predict_fn(model)

    params = variables["params"]
    if args.fold_bn:
        from unit_tpu.utils.bn_fold import fold_frozen_bn

        params = jax.jit(fold_frozen_bn)(params)
        print("FrozenBN folded into conv kernels (eval-only transform)")
    variables = {"params": params}

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

    if args.tta:
        # The reference's best-number protocol (rcnn.py:136-185): proposals
        # from the canonical frame, re-scored at TEST.AUG.MIN_SIZES x flip
        # (10 variants with the defaults).  Ours batches each scale's
        # flip pair through one backbone pass (predict_tta grouping).
        from unit_tpu.data.transforms import _canvas_for, tta_canvas_for

        min_sizes = (480, 576, 688, 864, 1200)
        max_size, div = 2000, 32
        aspect = 1333.0 / 800.0  # the synthetic canonical frame's aspect
        spec = []
        for ms in min_sizes:
            if args.wide_canvas:
                ch, cw = _canvas_for(ms, max_size, div)
            else:
                ch, cw = tta_canvas_for(ms, max_size, div, aspect)
            scale = ms / 800.0
            th, tw = ms, min(int(round(1333 * scale)), max_size)
            for flip in (False, True):
                spec.append((ch, cw, th, tw, scale, flip))
        var_arrays = [
            (
                jnp.asarray(rng.rand(1, ch, cw, 3), jnp.float32) * 255,
                jnp.asarray([[th, tw]], jnp.float32),
                np.float32(scale),
            )
            for ch, cw, th, tw, scale, flip in spec
        ]
        flips = tuple(s[-1] for s in spec)

        @jax.jit
        def tta_fn(params, cimg, csz, var_arrays):
            variants = [
                {"image": im, "image_size": sz, "scale": sc, "flip": fl}
                for (im, sz, sc), fl in zip(var_arrays, flips)
            ]
            return model.apply(
                {"params": params}, cimg, csz, variants,
                tta_topk=args.tta_topk, method=WSRCNN.predict_tta,
            )

        cimg = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32) * 255
        csz = jnp.asarray([[800, 1333]], jnp.float32)
        det = tta_fn(variables["params"], cimg, csz, var_arrays)
        float(np.asarray(det.scores).sum())
        iters = max(1, args.iters // 2)
        if args.trace:
            jax.profiler.start_trace(args.trace)
        t0 = time.perf_counter()
        for _ in range(iters):
            det = tta_fn(variables["params"], cimg, csz, var_arrays)
        float(np.asarray(det.scores).sum())
        per_img = (time.perf_counter() - t0) / iters
        if args.trace:
            jax.profiler.stop_trace()
            print(f"TTA trace written to {args.trace}")
        canvas_kind = "wide" if args.wide_canvas else "tight"
        print(
            f"TTA ({len(spec)} variants, grouped flip pairs, {canvas_kind} "
            f"canvases, topk={args.tta_topk or 'all'}): "
            f"{per_img:.3f} s/img ({1.0 / per_img:.2f} img/s)"
        )


if __name__ == "__main__":
    main()
