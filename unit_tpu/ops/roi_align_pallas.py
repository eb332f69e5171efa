"""Pallas TPU kernel for ROIAlignV2 forward.

The hot op of the C4 detector (SURVEY.md §2.6): pooling 512-1000 ROIs x 14x14
bins from a [H, W, C>=1024] feature map.  Kernel design:

  * grid = one program per ROI; the feature map stays in HBM (``pl.ANY``) and
    the ROI boxes are scalar-prefetched so DMA indices are computable up front.
  * per output row and y-sample, the two needed feature rows are DMA'd
    HBM->VMEM as one contiguous [2, W, C] slice.
  * interpolation along x runs on the MXU: a [S, W] two-nonzero weight matrix
    (built from broadcasted iota comparisons) matmuls the y-interpolated
    [W, C] row, yielding all S = P*s x-samples of that row at once — no
    per-sample dynamic slicing.
  * bilinear semantics match ROIAlignV2 (aligned=True, -0.5 offset,
    out-of-range samples contribute zero), verified against the XLA
    implementation in tests.

Backward uses the XLA implementation via ``jax.custom_vjp`` (scatter-add
gathers fuse well there, and the backward is off the inference hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import roi_align_xla


def _kernel(rois_ref, feat_ref, out_ref, row_buf, sem, *,
            output_size: int, spatial_scale: float, sampling_ratio: int,
            height: int, width: int, padded_width: int):
    p = output_size
    s = sampling_ratio
    n = pl.program_id(0)

    x1 = rois_ref[n, 0] * spatial_scale - 0.5
    y1 = rois_ref[n, 1] * spatial_scale - 0.5
    x2 = rois_ref[n, 2] * spatial_scale - 0.5
    y2 = rois_ref[n, 3] * spatial_scale - 0.5
    bin_h = (y2 - y1) / p
    bin_w = (x2 - x1) / p

    # x-sample coordinates for ALL bins (shared across output rows): [P*s]
    ks = jax.lax.broadcasted_iota(jnp.int32, (p * s, 1), 0)[:, 0].astype(jnp.float32)
    frac = ((ks % s) + 0.5) / s
    bins = jnp.floor(ks / s)
    xs = x1 + (bins + frac) * bin_w  # [P*s]
    x_oob = (xs < -1.0) | (xs > width)
    xc = jnp.clip(xs, 0.0, width - 1)
    x0 = jnp.floor(xc)
    lx = xc - x0
    # weight matrix [P*s, Wp]: (1-lx) at col x0, lx at col min(x0+1, W-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p * s, padded_width), 1).astype(
        jnp.float32
    )
    x0b = x0[:, None]
    x1b = jnp.minimum(x0 + 1, width - 1)[:, None]
    wx = jnp.where(cols == x0b, (1.0 - lx)[:, None], 0.0)
    wx = wx + jnp.where(cols == x1b, lx[:, None], 0.0)
    wx = jnp.where(x_oob[:, None], 0.0, wx)

    # NOTE: a rolling row-cache with predicated DMAs was tried here and measured
    # 4x SLOWER than the straight 2-row DMA (conditional copies defeat Mosaic's
    # DMA pipelining) — keep the simple unconditional fetch.
    def row_body(ph, _):
        acc = jnp.zeros((p * s, out_ref.shape[-1]), jnp.float32)

        def sample_body(iy, acc):
            y = y1 + (ph + (iy + 0.5) / s) * bin_h
            y_oob = (y < -1.0) | (y > height)
            yc = jnp.clip(y, 0.0, height - 1)
            y0 = jnp.floor(yc)
            ly = yc - y0
            y0i = jnp.minimum(y0.astype(jnp.int32), height - 2)
            y0i = jnp.maximum(y0i, 0)

            dma = pltpu.make_async_copy(
                feat_ref.at[pl.ds(y0i, 2)], row_buf, sem
            )
            dma.start()
            dma.wait()
            top = row_buf[0].astype(jnp.float32)
            bot = row_buf[1].astype(jnp.float32)
            # careful: if y0 == height-1 in the original space, we loaded rows
            # (height-2, height-1); adjust ly to sample row height-1 exactly.
            ly = jnp.where(y0.astype(jnp.int32) > y0i, 1.0, ly)
            row = top * (1.0 - ly) + bot * ly  # [W, C]
            row = jnp.where(y_oob, 0.0, row)
            samples = jax.lax.dot_general(
                wx, row, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return acc + samples

        acc = jax.lax.fori_loop(0, s, sample_body, acc)
        # average s x s samples per bin: pairs along the sample axis
        acc = acc.reshape(p, s, -1).sum(axis=1) / (s * s)
        out_ref[0, ph] = acc
        return 0

    jax.lax.fori_loop(0, p, row_body, 0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def roi_align_pallas(features, rois, output_size=14, spatial_scale=1.0 / 16.0,
                     sampling_ratio=2):
    """ROIAlignV2 (always 'aligned') forward on TPU via Pallas."""
    return _forward(features, rois, output_size, spatial_scale, sampling_ratio)


def _forward(features, rois, output_size, spatial_scale, sampling_ratio):
    h, w, c = features.shape
    # DMA slices of the HBM feature map need the row dimension aligned to the
    # dtype's sublane tiling (8 for f32, 16 for bf16).
    align = 16 if features.dtype == jnp.bfloat16 else 8
    wp = ((w + align - 1) // align) * align
    if wp != w:
        features = jnp.pad(features, ((0, 0), (0, wp - w), (0, 0)))
    n = rois.shape[0]
    p = output_size
    kernel = functools.partial(
        _kernel, output_size=p, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, height=h, width=w, padded_width=wp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, p, p, c), lambda n_, rois_: (n_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wp, c), features.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, c), jnp.float32),
    )(rois, features)
    return out


def _fwd(features, rois, output_size, spatial_scale, sampling_ratio):
    out = _forward(features, rois, output_size, spatial_scale, sampling_ratio)
    return out, (features, rois)


def _bwd(output_size, spatial_scale, sampling_ratio, residuals, g):
    features, rois = residuals
    from .roi_align_pallas_bwd import roi_align_backward_pallas

    df = roi_align_backward_pallas(
        g, rois, output_size, spatial_scale, sampling_ratio,
        tuple(features.shape),
    ).astype(features.dtype)
    return df, jnp.zeros_like(rois)


roi_align_pallas.defvjp(_fwd, _bwd)
