#!/usr/bin/env python
"""Component-level perf probe on the real TPU chip.

Times each stage of the train step in isolation (host-fetch synchronized) to
locate bottlenecks: backbone fwd/bwd, Res5 ROI heads, ROIAlign (pallas/xla),
RPN NMS at train sizes, and the full step.  Usage: python scripts/perf_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1000:8.1f} ms")
    return dt


def main():
    from __graft_entry__ import _model_config
    from unit_tpu.models import WSRCNN
    from unit_tpu.models import rpn as rpn_lib
    from unit_tpu.ops import nms as nms_ops
    from unit_tpu.ops.roi_align_pallas import roi_align_pallas
    from unit_tpu.ops.roi_align import roi_align_xla

    mc = _model_config(tiny=False)
    model = WSRCNN(mc=mc)
    b, h, w = 2, 800, 1344
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32) * 255
    sizes = jnp.asarray([[h, w]] * b, jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), imgs[:1, :256, :256], sizes[:1]))()

    # backbone forward
    bb_fwd = jax.jit(lambda v, im: model.apply(v, im, method=WSRCNN.features))
    feats = bb_fwd(variables, imgs)
    timeit("backbone fwd (2 img)", bb_fwd, variables, imgs)

    # backbone fwd+bwd
    def bb_loss(params, im):
        f = model.apply({"params": params}, im, method=WSRCNN.features)
        return jnp.sum(f.astype(jnp.float32) ** 2)

    bb_bwd = jax.jit(jax.grad(bb_loss))
    timeit("backbone fwd+bwd (2 img)", bb_bwd, variables["params"], imgs)

    # roi align
    feat1 = feats[0].astype(jnp.float32)
    rois = np.zeros((512, 4), np.float32)
    rois[:, :2] = rng.rand(512, 2) * 600
    rois[:, 2:] = rois[:, :2] + 30 + rng.rand(512, 2) * 400
    rois = jnp.asarray(rois)
    pa = jax.jit(lambda f, r: roi_align_pallas(f, r, 14, 1 / 16.0, 2))
    timeit("roi_align pallas 512 rois", pa, feat1, rois)
    xa = jax.jit(lambda f, r: roi_align_xla(f, r, 14, 1 / 16.0, 2, chunk_size=128))
    timeit("roi_align xla 512 rois", xa, feat1, rois)

    # roi_align backward (xla vjp)
    ra_bwd = jax.jit(jax.grad(lambda f: jnp.sum(roi_align_pallas(f, rois, 14, 1 / 16.0, 2))))
    timeit("roi_align fwd+bwd (custom vjp)", ra_bwd, feat1)

    # res5 over 1024 rois
    pooled = jnp.asarray(rng.rand(1024, 14, 14, 1024), jnp.float32)
    r5 = jax.jit(lambda v, p: model.apply(v, p, "box", method=WSRCNN.box_features))
    timeit("res5 box head 1024 rois fwd", r5, variables, pooled)

    def r5_loss(params, p):
        f = model.apply({"params": params}, p, "box", method=WSRCNN.box_features)
        return jnp.sum(f ** 2)

    r5b = jax.jit(jax.grad(r5_loss))
    timeit("res5 box head 1024 rois fwd+bwd", r5b, variables["params"], pooled)

    # NMS at train sizes
    n = 12000
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, :2] = rng.rand(n, 2) * 1200
    boxes[:, 2:] = boxes[:, :2] + 10 + rng.rand(n, 2) * 300
    scores = rng.rand(n).astype(np.float32)
    for tile in (128, 256, 512):
        f = jax.jit(lambda b_, s_: nms_ops.nms(b_, s_, 0.7, 2000, tile_size=tile))
        timeit(f"nms 12000->2000 tile={tile}", f, jnp.asarray(boxes), jnp.asarray(scores))

    # RPN losses (anchors/matching/sampling)
    anchors = rpn_lib.get_anchors(h // 16, w // 16, mc.rpn)
    print(f"anchors: {anchors.shape}")

    # full predict
    pred = jax.jit(lambda v, im, sz: model.apply(v, im, sz, method=WSRCNN.predict))
    timeit("full predict (2 img)", pred, variables, imgs, sizes)


if __name__ == "__main__":
    main()
