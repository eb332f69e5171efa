#!/usr/bin/env python
"""Serving-path throughput: single-image vs micro-batched DetectionService.

Measures requests/sec of the full service path (decode -> test-time transform
-> device predict -> original-frame postprocess) under concurrent client
load, for batch_size 1 vs N.  This is the serving analogue of
scripts/bench_eval.py and quantifies the micro-batcher (unit_tpu/serving).

    python scripts/bench_serving.py [--requests 64] [--clients 8] [--batch 4]
"""

import argparse
import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(service, requests, clients, mode):
    """-> (req/s, p50 ms, p99 ms) under ``clients`` concurrent callers."""
    call = service.detect_bytes if mode == "bytes" else service.detect_array
    lat = []

    def timed_call(r):
        t = time.perf_counter()
        out = call(r)
        lat.append((time.perf_counter() - t) * 1e3)
        return out

    with cf.ThreadPoolExecutor(clients) as pool:
        t0 = time.perf_counter()
        results = list(pool.map(timed_call, requests))
        dt = time.perf_counter() - t0
    assert all(isinstance(r, list) for r in results)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    return len(requests) / dt, p50, p99


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--min-size", type=int, default=800)
    ap.add_argument("--max-size", type=int, default=1344)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--mode", choices=("bytes", "array"), default="bytes",
                    help="bytes = full request path incl. JPEG decode "
                         "(C in-memory decoder when built); array = "
                         "pre-decoded ndarray input")
    ap.add_argument("--config-file", default="",
                    help="bench a shipped config (flagship arch) instead of "
                         "the bare cfg defaults")
    ap.add_argument("--weights", default="",
                    help="orbax checkpoint dir (or .npz) for trained params; "
                         "random init puts the RPN in its pathological "
                         "whole-image-boxes regime and times a program state "
                         "production never runs (BASELINE.md round 5)")
    ap.add_argument("--uint8-wire", action="store_true",
                    help="set TPU.HOST_TRANSFER_UINT8: uint8 request wire "
                         "(4x fewer host->device bytes, <=0.5 LSB)")
    ap.add_argument("--orientations", default="both",
                    choices=("both", "landscape", "portrait"),
                    help="canvas orientations to warm up (single-orientation "
                         "request streams need not compile the other)")
    ap.add_argument("--images-dir", default="",
                    help="directory of real JPEGs for the request stream "
                         "(cycled); default = synthetic noise JPEGs, which "
                         "decode ~3x slower than natural images")
    args = ap.parse_args()

    import jax

    # the JAX_PLATFORMS env var is pinned by the axon runtime; the config API
    # is the only way to force CPU (same contract as engine/runner.py:103)
    plat = os.environ.get("UNIT_TPU_PLATFORM", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    from unit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from unit_tpu.config import get_cfg
    from unit_tpu.models import ModelConfig, WSRCNN
    from unit_tpu.serving import DetectionService

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.MODEL.RESNETS.DEPTH = args.depth
    cfg.INPUT.MIN_SIZE_TEST = args.min_size
    cfg.INPUT.MAX_SIZE_TEST = args.max_size
    if args.uint8_wire:
        cfg.TPU.HOST_TRANSFER_UINT8 = True
    model = WSRCNN(mc=ModelConfig.from_cfg(cfg))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )
    params = variables["params"]
    if args.weights:
        from unit_tpu.engine.runner import load_initial_weights

        cfg.MODEL.WEIGHTS = args.weights
        params = load_initial_weights(cfg, jax.device_get(params))

    rng = np.random.RandomState(0)
    if args.images_dir:
        import glob

        files = sorted(
            glob.glob(os.path.join(args.images_dir, "**", "*.jpg"),
                      recursive=True)
        )
        assert files, f"no JPEGs under {args.images_dir}"
        jpegs = [open(files[i % len(files)], "rb").read()
                 for i in range(args.requests)]
        if args.mode == "bytes":
            requests = jpegs
        else:
            from PIL import Image
            import io

            requests = [
                np.asarray(
                    Image.open(io.BytesIO(b)).convert("RGB"), np.float32
                )[:, :, ::-1]
                for b in jpegs
            ]
    else:
        # landscape-only request stream (one orientation = one program per
        # config); off-canvas dims so the resize path genuinely runs
        h, w = int(args.min_size * 0.96), int(args.max_size * 0.97)
        arrays = [
            rng.rand(h, w, 3).astype(np.float32) * 255
            for _ in range(args.requests)
        ]
        if args.mode == "bytes":
            import io

            from PIL import Image

            requests = []
            for a in arrays:
                buf = io.BytesIO()
                Image.fromarray(a.astype(np.uint8)).save(
                    buf, format="JPEG", quality=90)
                requests.append(buf.getvalue())
        else:
            requests = arrays

    svc1 = DetectionService(cfg, model=model, params=params)
    svc1.warmup(orientations=args.orientations)
    run(svc1, requests[: args.clients * 2], args.clients, args.mode)
    r1, p50_1, p99_1 = run(svc1, requests, args.clients, args.mode)
    print(f"[{args.mode}] c={args.clients} batch 1:       {r1:.2f} req/s  "
          f"p50 {p50_1:.0f} ms  p99 {p99_1:.0f} ms")

    svcN = DetectionService(cfg, model=model, params=params,
                            batch_size=args.batch, batch_wait_ms=10.0)
    svcN.warmup(orientations=args.orientations)  # every pow-2 batch program
    run(svcN, requests[: args.clients * 2], args.clients, args.mode)
    rN, p50_N, p99_N = run(svcN, requests, args.clients, args.mode)
    print(f"[{args.mode}] c={args.clients} batch {args.batch} (micro): "
          f"{rN:.2f} req/s  p50 {p50_N:.0f} ms  p99 {p99_N:.0f} ms  "
          f"speedup x{rN / r1:.2f}")
    # latency/throughput vs concurrency for the micro-batched service
    for c in (1, 2, 4, 8, 16):
        if c == args.clients or c > args.requests:
            continue
        rc, p50_c, p99_c = run(svcN, requests, c, args.mode)
        print(f"[{args.mode}] c={c} batch {args.batch} (micro): "
              f"{rc:.2f} req/s  p50 {p50_c:.0f} ms  p99 {p99_c:.0f} ms")
    svcN.close()


if __name__ == "__main__":
    main()
