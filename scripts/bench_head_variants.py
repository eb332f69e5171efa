#!/usr/bin/env python
"""Benchmark alternative formulations of the Res5 ROI-head convs on the chip.

The round-2 trace put the dual Res5 heads at ~62 ms/step with conv FORWARD
passes at 50-60% MFU while wgrads hit ~95% (BASELINE.md subsystem table).
This script measures a single Res5 stage on the head's real shapes
([R, 14, 14, 1024] bf16 -> [R, 7, 7, 2048]) under different conv
formulations, fwd-only and fwd+bwd, to find out whether the fwd MFU gap is
XLA's conv lowering (fixable by reformulating) or structural.

Variants:
  conv     - nn.Conv as shipped (XLA conv_general_dilated)
  taps     - 3x3 convs as 9 shifted [rows, C] @ [C, C'] matmul taps
  im2col   - 3x3 convs as patch-concat + one [rows, 9C] @ [9C, C'] matmul
  fusedsc  - conv (as shipped) but conv3+shortcut of block0 merged into one
             [rows, Cin+Cmid] @ [Cin+Cmid, Cout] matmul

Timing protocol per docs: scalar host fetch as the barrier.
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


def _stage_flops(R):
    # Res5 fwd FLOPs per ROI (stride_in_1x1, 14x14 -> 7x7, 1024 -> 2048).
    b0 = 49 * (1024 * 512 + 9 * 512 * 512 + 512 * 2048 + 1024 * 2048) * 2
    b12 = 49 * (2048 * 512 + 9 * 512 * 512 + 512 * 2048) * 2
    return R * (b0 + 2 * b12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=1024)
    args = ap.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp
    from jax import lax

    R = args.rois
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(R, 14, 14, 1024).astype(np.float32) - 0.5).astype(dt)

    def mk(shape):
        return jnp.asarray((rng.rand(*shape).astype(np.float32) - 0.5) * 0.05).astype(dt)

    # block params: [ (w1, w2, w3, wsc|None) x 3 ]
    params = []
    cin = 1024
    for i in range(3):
        w1 = mk((1, 1, cin, 512))
        w2 = mk((3, 3, 512, 512))
        w3 = mk((1, 1, 512, 2048))
        wsc = mk((1, 1, cin, 2048)) if i == 0 else None
        params.append((w1, w2, w3, wsc))
        cin = 2048
    flat_params = [w for blk in params for w in blk if w is not None]

    def unflatten(ps):
        out, i = [], 0
        for blk in params:
            n = sum(1 for w in blk if w is not None)
            ws = list(ps[i:i + n]) + [None] * (4 - n)
            out.append(tuple(ws))
            i += n
        return out

    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, stride=1, pad=0):
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn)

    def conv3_taps(x, w):
        # x: [R, H, W, C] (stride 1, pad 1). out[r,y,w,:] = sum_taps
        Rr, H, W, C = x.shape
        Co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((Rr, H, W, Co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = lax.dynamic_slice(xp, (0, dy, dx, 0), (Rr, H, W, C))
                out = out + jnp.einsum(
                    "rhwc,cd->rhwd", sl, w[dy, dx],
                    preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    def conv3_im2col(x, w):
        Rr, H, W, C = x.shape
        Co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        pats = [lax.dynamic_slice(xp, (0, dy, dx, 0), (Rr, H, W, C))
                for dy in range(3) for dx in range(3)]
        pat = jnp.concatenate(pats, axis=-1)          # [R, H, W, 9C]
        return jnp.einsum("rhwc,cd->rhwd", pat, w.reshape(9 * C, Co),
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def relu(v):
        return jnp.maximum(v, 0)

    def block(x, w1, w2, w3, wsc, mode):
        stride = 2 if wsc is not None else 1
        if mode == "fusedsc" and wsc is not None:
            # conv1 (1x1 s2) then 3x3; conv3+shortcut as one matmul over
            # concat(out2, strided x)
            out = relu(conv(x, w1, stride=stride))
            out = relu(conv(out, w2, pad=1))
            xs = x[:, ::stride, ::stride, :]
            cat = jnp.concatenate([out, xs], axis=-1)
            wcat = jnp.concatenate([w3[0, 0], wsc[0, 0]], axis=0)
            return relu(jnp.einsum("rhwc,cd->rhwd", cat, wcat,
                                   preferred_element_type=jnp.float32).astype(x.dtype))
        out = relu(conv(x, w1, stride=stride))
        if mode == "taps":
            out = relu(conv3_taps(out, w2))
        elif mode == "im2col":
            out = relu(conv3_im2col(out, w2))
        else:
            out = relu(conv(out, w2, pad=1))
        out = conv(out, w3)
        sc = conv(x, wsc, stride=stride) if wsc is not None else x
        return relu(out + sc)

    def stage(ps, x, mode):
        for (w1, w2, w3, wsc) in unflatten(ps):
            x = block(x, w1, w2, w3, wsc, mode)
        return x

    gf = _stage_flops(R) / 1e9
    print(f"backend: {jax.default_backend()}  R={R}  fwd GFLOP={gf:.1f}")

    for mode in ["conv", "taps", "im2col", "fusedsc"]:
        f_fwd = jax.jit(lambda ps, x, m=mode: jnp.sum(
            stage(ps, x, m).astype(jnp.float32)))
        ms = _time(f_fwd, flat_params, x)
        print(f"{mode:8s} fwd      : {ms:7.2f} ms   {gf/ms:7.1f} TF/s")

        def loss(ps, x, m=mode):
            return jnp.sum(stage(ps, x, m).astype(jnp.float32) ** 2)
        f_fb = jax.jit(lambda ps, x, m=mode: sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.grad(loss)(ps, x)))
        ms = _time(f_fb, flat_params, x)
        print(f"{mode:8s} fwd+bwd  : {ms:7.2f} ms   {3*gf/ms:7.1f} TF/s")


if __name__ == "__main__":
    main()
