#!/usr/bin/env python
"""Measure the Pallas custom-call boundary layout copies (round-3 anatomy:
5.6 ms relaying [1024,14,14,1024] in/out of the ROIAlign custom calls, which
must take default layouts vs the consuming conv's preferred layout).

Hypothesis under test (round-4 verdict item 4a): if the FIRST op consuming
the pooled tensor is a dot_general on the flattened rows instead of a conv,
XLA has no conv-layout preference to satisfy at the boundary, so the
relayout of the big pooled tensor disappears (the 1x1 stride-2 conv1 +
shortcut of res5.block0 are exactly subsample+matmul).  The relayout then
moves to the 8x smaller post-conv1 tensor.

Variants (full Res5 stage, fwd+bwd, input produced by the REAL Pallas
ROIAlign kernel from a realistic backbone-shaped feature map):
  conv    - stage as shipped (nn.Conv everywhere)
  dotentry- block0 conv1 + shortcut as strided-slice + dot_general;
            everything downstream unchanged
  nopallas- 'conv' variant fed from a plain device array (no custom call):
            isolates how much of conv-vs-dotentry is really the boundary

Usage: python scripts/bench_boundary_layout.py [--rois 512] [--iters 10]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _time(fn, *args, iters=10):
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=512, help="ROIs per image")
    ap.add_argument("--imgs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla"],
                    help="xla allows a CPU smoke run (no custom-call boundary)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    import flax.linen as nn
    from typing import Any

    from unit_tpu.models.resnet import ResNetStage
    from unit_tpu.ops import roi_align as roi_align_ops

    DT = jnp.bfloat16

    class DotConv1x1(nn.Module):
        """1x1 conv as subsample + dot_general (exactly equal for 1x1 kernels)."""

        features: int
        stride: int = 1
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            cin = x.shape[-1]
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features)
            )
            if self.stride > 1:
                x = x[:, :: self.stride, :: self.stride, :]
            n, h, w, _ = x.shape
            y = jax.lax.dot_general(
                x.reshape(n * h * w, cin).astype(self.dtype),
                kernel.reshape(cin, self.features).astype(self.dtype),
                (((1,), (0,)), ((), ())),
            )
            return y.reshape(n, h, w, self.features)

    from unit_tpu.models.resnet import BottleneckBlock, FrozenBN, relu

    class DotEntryBlock(nn.Module):
        """BottleneckBlock block0 with conv1+shortcut as slice+matmul."""

        out_channels: int
        bottleneck_channels: int
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            out = DotConv1x1(self.bottleneck_channels, stride=2, dtype=self.dtype,
                             name="conv1")(x)
            out = FrozenBN(self.bottleneck_channels, dtype=self.dtype,
                           name="conv1_bn")(out)
            out = relu(out)
            out = nn.Conv(self.bottleneck_channels, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, dtype=self.dtype, name="conv2")(out)
            out = FrozenBN(self.bottleneck_channels, dtype=self.dtype,
                           name="conv2_bn")(out)
            out = relu(out)
            out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          dtype=self.dtype, name="conv3")(out)
            out = FrozenBN(self.out_channels, dtype=self.dtype, name="conv3_bn")(out)
            sc = DotConv1x1(self.out_channels, stride=2, dtype=self.dtype,
                            name="shortcut")(x)
            sc = FrozenBN(self.out_channels, dtype=self.dtype, name="shortcut_bn")(sc)
            return relu(out + sc)

    class Res5DotEntry(nn.Module):
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            x = DotEntryBlock(2048, 512, dtype=self.dtype, name="block0")(x)
            for i in (1, 2):
                x = BottleneckBlock(out_channels=2048, bottleneck_channels=512,
                                    dtype=self.dtype, name=f"block{i}")(x)
            return x

    stage = ResNetStage(num_blocks=3, out_channels=2048, bottleneck_channels=512,
                        first_stride=2, dtype=DT)
    stage_dot = Res5DotEntry(dtype=DT)

    rng = np.random.RandomState(0)
    fh, fw, c = 50, 84, 1024
    feats = jnp.asarray(rng.rand(args.imgs, fh, fw, c), DT)
    boxes = np.zeros((args.imgs, args.rois, 4), np.float32)
    boxes[..., :2] = rng.rand(args.imgs, args.rois, 2) * 400
    boxes[..., 2:] = boxes[..., :2] + 32 + rng.rand(args.imgs, args.rois, 2) * 400
    boxes = jnp.asarray(boxes)

    pooled_shape = (args.imgs * args.rois, 14, 14, c)
    v_conv = stage.init(jax.random.PRNGKey(0), jnp.zeros(pooled_shape, DT))
    v_dot = stage_dot.init(jax.random.PRNGKey(0), jnp.zeros(pooled_shape, DT))

    def pooled_from_pallas(f, b):
        out = roi_align_ops.roi_align_batched(
            f, b, 14, 1.0 / 16.0, 2, aligned=True, impl=args.impl
        )
        return out.reshape((-1,) + out.shape[2:])

    def make_loss(apply_stage, via_pallas):
        def loss(params, f, b):
            pooled = pooled_from_pallas(f, b) if via_pallas else f
            y = apply_stage(params, pooled)
            return jnp.sum(y.astype(jnp.float32))

        return loss

    pooled_direct = jnp.asarray(
        rng.rand(*pooled_shape).astype(np.float32), DT
    )

    # dotentry must be numerically IDENTICAL to conv with shared params
    # (a strided 1x1 conv is exactly subsample+matmul); assert before timing
    y_conv = jax.jit(lambda p, x: stage.apply(p, x))(v_conv, pooled_direct)
    y_dot = jax.jit(lambda p, x: stage_dot.apply(p, x))(v_conv, pooled_direct)
    np.testing.assert_allclose(
        np.asarray(y_conv, np.float32), np.asarray(y_dot, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16 accumulation-order noise only
    )
    print("equality check: dotentry == conv (shared params) OK")

    results = {}
    for name, (apply_fn, vs, via_pallas, inp) in {
        "conv": (lambda p, x: stage.apply(p, x), v_conv, True, feats),
        "dotentry": (lambda p, x: stage_dot.apply(p, x), v_dot, True, feats),
        "nopallas": (lambda p, x: stage.apply(p, x), v_conv, False, pooled_direct),
    }.items():
        loss = make_loss(apply_fn, via_pallas)
        fwd = jax.jit(loss)
        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

        def g_scalar(p, f, b, _grad=grad):
            gs = _grad(p, f, b)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), gs, 0.0
            )

        gj = jax.jit(g_scalar)
        t_f = _time(fwd, vs, inp, boxes, iters=args.iters)
        t_fb = _time(gj, vs, inp, boxes, iters=args.iters)
        results[name] = (t_f, t_fb)
        print(f"{name:9s} fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms")

    c_f, c_fb = results["conv"]
    d_f, d_fb = results["dotentry"]
    print(f"\ndotentry vs conv: fwd {d_f - c_f:+.2f} ms, fwd+bwd {d_fb - c_fb:+.2f} ms")


if __name__ == "__main__":
    main()
