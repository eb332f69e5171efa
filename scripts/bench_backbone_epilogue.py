#!/usr/bin/env python
"""Attack the backbone fusion tail (round-3 anatomy: stem..res4 at 30.6 ms
vs a ~20 ms activation-byte floor; the gap is a 275-op tail of BN/ReLU/add
fusions measured at 500-935 GB/s).

Round-4 verdict item 4b names one candidate: fuse the FrozenBN+ReLU(+add)
epilogue into the conv.  Two mechanisms are measurable at the JAX surface:

  folded  - fold the BN scale into the conv kernel algebraically
            (conv(x, W)*s + b == conv(x, W*s) + b), leaving only
            add-bias+relu(+shortcut) as the epilogue.  If XLA already emits
            BN scale/shift/relu as ONE fusion pass over the conv output,
            folding saves no memory traffic and should measure at parity.
  pallas  - replace the epilogue chain relu(x*s + b + sc) with a Pallas
            elementwise kernel at the res4 shapes, measuring whether a
            hand kernel can stream closer to HBM peak than XLA's fusion
            (custom-call layout boundaries included, as they would be in
            the real network).

Measured on one res4-shaped bottleneck block ([B, 50, 84, 1024] bf16,
bottleneck 256), fwd and fwd+bwd, plus the isolated epilogue in both forms.

Usage: python scripts/bench_backbone_epilogue.py [--batch 4] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax_sum = float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out))
    del jax_sum
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
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

    DT = jnp.bfloat16
    b, h, w, c, cm = args.batch, 50, 84, 1024, 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32), DT)

    # one bottleneck block's weights (res4 interior block: no shortcut conv)
    W1 = jnp.asarray(rng.randn(1, 1, c, cm).astype(np.float32) * 0.05, DT)
    W2 = jnp.asarray(rng.randn(3, 3, cm, cm).astype(np.float32) * 0.05, DT)
    W3 = jnp.asarray(rng.randn(1, 1, cm, c).astype(np.float32) * 0.05, DT)
    bn = {
        k: (
            jnp.asarray(1.0 + 0.1 * rng.rand(n).astype(np.float32)),
            jnp.asarray(0.1 * rng.randn(n).astype(np.float32)),
        )
        for k, n in (("bn1", cm), ("bn2", cm), ("bn3", c))
    }

    dn = jax.lax.conv_dimension_numbers((b, h, w, c), (1, 1, c, cm),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, W, pad):
        return jax.lax.conv_general_dilated(
            x, W, (1, 1), pad, dimension_numbers=dn, preferred_element_type=DT
        )

    def block_shipped(params, x):
        W1, W2, W3 = params
        o = conv(x, W1, "VALID")
        s, t = bn["bn1"]
        o = jax.nn.relu(o * s.astype(DT) + t.astype(DT))
        o = conv(o, W2, ((1, 1), (1, 1)))
        s, t = bn["bn2"]
        o = jax.nn.relu(o * s.astype(DT) + t.astype(DT))
        o = conv(o, W3, "VALID")
        s, t = bn["bn3"]
        o = o * s.astype(DT) + t.astype(DT)
        return jax.nn.relu(o + x)

    def block_folded(params, x):
        W1, W2, W3 = params
        s1, t1 = bn["bn1"]
        s2, t2 = bn["bn2"]
        s3, t3 = bn["bn3"]
        o = conv(x, W1 * s1.astype(DT), "VALID")
        o = jax.nn.relu(o + t1.astype(DT))
        o = conv(o, W2 * s2.astype(DT), ((1, 1), (1, 1)))
        o = jax.nn.relu(o + t2.astype(DT))
        o = conv(o, W3 * s3.astype(DT), "VALID")
        return jax.nn.relu(o + t3.astype(DT) + x)

    params = (W1, W2, W3)
    for name, f in (("shipped", block_shipped), ("folded", block_folded)):
        loss = lambda p, x, _f=f: jnp.sum(_f(p, x).astype(jnp.float32))
        fwd = jax.jit(loss)
        gj = jax.jit(
            lambda p, x, _l=loss: jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(jnp.abs(g).astype(jnp.float32)),
                jax.grad(_l, argnums=(0, 1))(p, x), 0.0,
            )
        )
        t_f = _time(fwd, params, x, iters=args.iters)
        t_fb = _time(gj, params, x, iters=args.iters)
        print(f"block {name:8s} fwd {t_f:6.3f} ms   fwd+bwd {t_fb:6.3f} ms")

    # isolated epilogue: relu(x*s + t + sc) over [b,h,w,c]
    sc = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32), DT)
    s3, t3 = bn["bn3"]
    bytes_moved = (2 * x.size + x.size) * 2  # read x + sc, write out (bf16)

    def ep_xla(x, sc):
        return jnp.sum(
            jax.nn.relu(x * s3.astype(DT) + t3.astype(DT) + sc).astype(jnp.float32)
        )

    t_x = _time(jax.jit(ep_xla), x, sc, iters=args.iters)
    print(f"epilogue XLA fusion: {t_x:6.3f} ms  ({bytes_moved / t_x / 1e6:.0f} GB/s)")

    if not args.cpu:
        from jax.experimental import pallas as pl

        def ep_kernel(x_ref, sc_ref, s_ref, t_ref, o_ref):
            xv = x_ref[...].astype(jnp.float32)
            scv = sc_ref[...].astype(jnp.float32)
            o_ref[...] = jnp.maximum(
                xv * s_ref[...] + t_ref[...] + scv, 0.0
            ).astype(o_ref.dtype)

        rows = b * h * w
        blk = next(bk for bk in range(2048, 7, -8) if rows % bk == 0)

        def ep_pallas(x, sc):
            xf = x.reshape(rows, c)
            scf = sc.reshape(rows, c)
            out = pl.pallas_call(
                ep_kernel,
                grid=(rows // blk,),
                in_specs=[
                    pl.BlockSpec((blk, c), lambda i: (i, 0)),
                    pl.BlockSpec((blk, c), lambda i: (i, 0)),
                    pl.BlockSpec((1, c), lambda i: (0, 0)),
                    pl.BlockSpec((1, c), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, c), DT),
            )(xf, scf, s3.reshape(1, c), t3.reshape(1, c))
            return jnp.sum(out.astype(jnp.float32))

        t_p = _time(jax.jit(ep_pallas), x, sc, iters=args.iters)
        print(
            f"epilogue Pallas:     {t_p:6.3f} ms  "
            f"({bytes_moved / t_p / 1e6:.0f} GB/s)"
        )


if __name__ == "__main__":
    main()
