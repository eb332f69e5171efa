#!/usr/bin/env python
"""Microbenchmarks for the TPU-native hot ops (ROIAlign fwd/bwd, NMS).

Reproduces the kernel numbers in BASELINE.md on the attached chip:

    python scripts/microbench_ops.py            # all ops
    python scripts/microbench_ops.py --op roi_align

Timing protocol per docs: device-side reduction + scalar host fetch as the
barrier (block_until_ready can return early through a remote-attach tunnel,
and fetching a full tensor ships it through the tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, *args, iters=20):
    import jax.numpy as jnp
    import numpy as np

    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1e3


def _bwd_fn(jax, jnp, roi_align_pallas_batched, rois):
    return jax.jit(lambda f: jnp.sum(jax.grad(
        lambda x: jnp.sum(roi_align_pallas_batched(x, rois, 14, 1 / 16.0, 2)
                          .astype(jnp.float32))
    )(f).astype(jnp.float32)))


def bench_roi_align():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unit_tpu.ops.roi_align import roi_align_xla
    from unit_tpu.ops.roi_align_pallas import roi_align_pallas_batched

    B, H, W, C, N = 2, 50, 84, 1024, 512
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    rois = np.zeros((B, N, 4), np.float32)
    rois[..., :2] = rng.rand(B, N, 2) * 600
    rois[..., 2:] = rois[..., :2] + 20 + rng.rand(B, N, 2) * 500
    rois = jnp.asarray(rois)

    fwd = jax.jit(lambda f, r: jnp.sum(
        roi_align_pallas_batched(f, r, 14, 1 / 16.0, 2).astype(jnp.float32)))
    bwd = jax.jit(lambda f: jnp.sum(jax.grad(
        lambda x: jnp.sum(roi_align_pallas_batched(x, rois, 14, 1 / 16.0, 2)
                          .astype(jnp.float32))
    )(f).astype(jnp.float32)))
    xla1 = jax.jit(lambda f, r: jnp.sum(roi_align_xla(f, r, 14, 1 / 16.0, 2)))

    print(f"roi_align pallas fwd  (2x{N} ROIs): {_time(fwd, feats, rois):8.2f} ms")
    print(f"roi_align pallas bwd  (2x{N} ROIs): {_time(bwd, feats):8.2f} ms")
    print(f"roi_align xla fwd     (1x{N} ROIs): "
          f"{_time(xla1, feats[0].astype(jnp.float32), rois[0]):8.2f} ms")

    # small RPN-proposal-like boxes (30-180 px): exercises the narrow +
    # single-RMW backward tiers that dominate the real train step
    rois_s = np.zeros((B, N, 4), np.float32)
    rois_s[..., :2] = rng.rand(B, N, 2) * 1100
    rois_s[..., 2:] = rois_s[..., :2] + 30 + rng.rand(B, N, 2) * 150
    rois_s = jnp.asarray(np.minimum(rois_s, 1330))
    bwd_s = jax.jit(lambda f: jnp.sum(jax.grad(
        lambda x: jnp.sum(roi_align_pallas_batched(x, rois_s, 14, 1 / 16.0, 2)
                          .astype(jnp.float32))
    )(f).astype(jnp.float32)))
    print(f"roi_align pallas bwd small (2x{N}): {_time(bwd_s, feats):8.2f} ms")

    # anchor-like boxes (sizes 32..512 px, what near-zero RPN deltas give)
    sizes = 32 * (2.0 ** rng.randint(0, 5, (B, N, 2)))  # 32..512 px per side
    ctr = rng.rand(B, N, 2) * np.array([1344, 800])
    rois_a = np.clip(np.concatenate([ctr - sizes / 2, ctr + sizes / 2], axis=-1),
                     0, [1343, 799, 1343, 799]).astype(np.float32)
    bwd_a = _bwd_fn(jax, jnp, roi_align_pallas_batched, jnp.asarray(rois_a))
    print(f"roi_align pallas bwd anchor-like (2x{N}): {_time(bwd_a, feats):8.2f} ms")

    # image-scale boxes (600-1340 x 400-790 px): post-NMS clipped proposals
    # from an UNTRAINED RPN span most of the feature map.  This regime is
    # what bench.py / profile_train_step actually pay inside the step
    # (in-step bwd ~11.3 ms sits between 'mixed' and 'image-scale'); a
    # TRAINED RPN pays the 'small' regime instead.
    rois_h = np.zeros((B, N, 4), np.float32)
    rois_h[..., 0] = rng.rand(B, N) * 300
    rois_h[..., 1] = rng.rand(B, N) * 200
    rois_h[..., 2] = np.minimum(rois_h[..., 0] + 600 + rng.rand(B, N) * 740, 1343)
    rois_h[..., 3] = np.minimum(rois_h[..., 1] + 400 + rng.rand(B, N) * 390, 799)
    bwd_h = _bwd_fn(jax, jnp, roi_align_pallas_batched, jnp.asarray(rois_h))
    print(f"roi_align pallas bwd image-scale (2x{N}): {_time(bwd_h, feats):8.2f} ms")

    mixed = np.where(rng.rand(B, N, 1) < 0.5, rois_h, rois_a)
    bwd_m = _bwd_fn(jax, jnp, roi_align_pallas_batched, jnp.asarray(mixed))
    print(f"roi_align pallas bwd mixed       (2x{N}): {_time(bwd_m, feats):8.2f} ms")


def bench_nms():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unit_tpu.ops.nms import nms_sorted_mask
    from unit_tpu.ops.nms_pallas import nms_sorted_mask_pallas

    n = 12000
    rng = np.random.RandomState(0)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, :2] = rng.rand(n, 2) * 1000
    boxes[:, 2:] = boxes[:, :2] + 20 + rng.rand(n, 2) * 200
    boxes = jnp.asarray(boxes)

    f_xla = jax.jit(lambda b: jnp.sum(nms_sorted_mask(b, 0.7)))
    f_cap = jax.jit(lambda b: jnp.sum(nms_sorted_mask(b, 0.7, max_keep=2000)))
    f_pal = jax.jit(lambda b: jnp.sum(nms_sorted_mask_pallas(b, 0.7)))
    print(f"nms xla tiled   ({n} boxes): {_time(f_xla, boxes):8.2f} ms")
    print(f"nms capped 2000 ({n} boxes): {_time(f_cap, boxes):8.2f} ms "
          f"(the RPN train case: post_nms_topk survivor buffer)")
    print(f"nms pallas      ({n} boxes): {_time(f_pal, boxes):8.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=["roi_align", "nms", "all"], default="all")
    args = ap.parse_args()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})")
    if args.op in ("roi_align", "all"):
        bench_roi_align()
    if args.op in ("nms", "all"):
        bench_nms()


if __name__ == "__main__":
    main()
