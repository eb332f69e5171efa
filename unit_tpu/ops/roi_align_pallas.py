"""Pallas TPU kernel for ROIAlignV2 forward (batch-native).

The hot op of the C4 detector (SURVEY.md §2.6): the TPU-native equivalent of
the detectron2 CUDA ROIAlignV2 op the reference requests by name
(/root/reference/configs/VOC/VOC-RCNN-101-C4-split1.yaml:24, pooled by
d2 ROIPooler at modeling/roi_heads/roi_heads.py:69-82) — pooling 512-1000
ROIs x 14x14 bins from [B, H, W, C>=1024] feature maps.  Kernel design:

  * grid = (B, N) — one program per (image, ROI).  Batch lives IN the grid:
    wrapping the single-image kernel in ``jax.vmap`` lowers to a sequential
    ``lax.while`` over images (each iteration a separate kernel launch), which
    profiling showed cost ~42% of the train step; the batched grid keeps the
    whole batch inside one pipelined kernel invocation.
  * the feature map stays in HBM (``pl.ANY``), flattened to [(B*H), W, C] so
    per-row DMAs address row ``b*H + y`` — ROI rows never cross an image
    boundary because y is clamped to [0, H-2].
  * ROI boxes are scalar-prefetched so DMA indices are computable up front.
  * per output row and y-sample, the two needed feature rows are DMA'd
    HBM->VMEM as one contiguous [2, W, C] slice.
  * interpolation along x runs on the MXU: a [S, W] two-nonzero weight matrix
    (built from broadcasted iota comparisons) matmuls the y-interpolated
    [W, C] row, yielding all S = P*s x-samples of that row at once — no
    per-sample dynamic slicing.
  * bilinear semantics match ROIAlignV2 (aligned=True, -0.5 offset,
    out-of-range samples contribute zero), verified against the XLA
    implementation in tests.

Backward is the matching batch-native Pallas kernel in
``roi_align_pallas_bwd.py`` via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roi_coords(rois_ref, b, n, num_rois, spatial_scale):
    """Read one ROI from the FLAT scalar-prefetch buffer.

    The rois operand is prefetched into SMEM as 1-D [B*N*4]: a [B, N, 4]
    layout gets its last dim padded to the 128-lane tile (a 32x blowup —
    f32[4,512,4] would claim exactly the whole 1 MiB of SMEM, which is how the
    320px/batch-4 shapes-VOC config overflowed SMEM)."""
    base = (b * num_rois + n) * 4
    x1 = rois_ref[base + 0] * spatial_scale - 0.5
    y1 = rois_ref[base + 1] * spatial_scale - 0.5
    x2 = rois_ref[base + 2] * spatial_scale - 0.5
    y2 = rois_ref[base + 3] * spatial_scale - 0.5
    return x1, y1, x2, y2


def _kernel(rois_ref, feat_ref, out_ref, row_buf, sem, *,
            output_size: int, spatial_scale: float, sampling_ratio: int,
            height: int, width: int, padded_width: int, num_rois: int):
    p = output_size
    s = sampling_ratio
    b = pl.program_id(0)
    n = pl.program_id(1)

    x1, y1, x2, y2 = _roi_coords(rois_ref, b, n, num_rois, spatial_scale)
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

    row0 = b * height  # first flattened row of this image

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
                feat_ref.at[pl.ds(row0 + y0i, 2)], row_buf, sem
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
        out_ref[0, 0, ph] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, p, row_body, 0)


def _kernel_vmem(rois_ref, feat_ref, out_ref, feat_vmem, r_vmem, sem, *,
                 output_size: int, spatial_scale: float, sampling_ratio: int,
                 height: int, width: int, padded_width: int, num_rois: int):
    """VMEM-resident variant: the whole [H, Wp, C] feature map of image b is
    DMA'd into a persistent VMEM scratch once (at the image's first ROI) and
    every bilinear row read is then a VMEM load.

    The per-(row, y-sample) small matmuls of the DMA variant dominate its
    runtime (28 dependent [P*s, Wp]x[Wp, C] MXU ops per ROI measured ~21 ms
    per 2x512 ROIs); here the y-interpolated+summed rows of every output row
    are staged side-by-side in a [Wp, P*C] scratch and the whole ROI reduces
    to ONE [P, Wp] x [Wp, P*C] matmul, with both the s-sample sums and the
    1/s^2 bin average folded into the x-weight matrix."""
    p = output_size
    s = sampling_ratio
    b = pl.program_id(0)
    n = pl.program_id(1)
    c = out_ref.shape[-1]

    @pl.when(n == 0)
    def _load_image():
        dma = pltpu.make_async_copy(feat_ref.at[b], feat_vmem, sem)
        dma.start()
        dma.wait()

    x1, y1, x2, y2 = _roi_coords(rois_ref, b, n, num_rois, spatial_scale)
    bin_h = (y2 - y1) / p
    bin_w = (x2 - x1) / p

    ks = jax.lax.broadcasted_iota(jnp.int32, (p * s, 1), 0)[:, 0].astype(jnp.float32)
    frac = ((ks % s) + 0.5) / s
    bins = jnp.floor(ks / s)
    xs = x1 + (bins + frac) * bin_w
    x_oob = (xs < -1.0) | (xs > width)
    xc = jnp.clip(xs, 0.0, width - 1)
    x0 = jnp.floor(xc)
    lx = xc - x0
    cols = jax.lax.broadcasted_iota(jnp.int32, (p * s, padded_width), 1).astype(
        jnp.float32
    )
    x0b = x0[:, None]
    x1b = jnp.minimum(x0 + 1, width - 1)[:, None]
    wx = jnp.where(cols == x0b, (1.0 - lx)[:, None], 0.0)
    wx = wx + jnp.where(cols == x1b, lx[:, None], 0.0)
    wx = jnp.where(x_oob[:, None], 0.0, wx)
    # fold x-sample-pair summation and the 1/s^2 average into the weights
    wx_bins = wx.reshape(p, s, padded_width).sum(axis=1) / (s * s)  # [P, Wp]

    # static unroll over output rows: lets Mosaic pipeline the row loads and
    # keeps every R-scratch slice static
    for ph in range(p):
        acc = jnp.zeros((padded_width, c), jnp.float32)
        for iy in range(s):
            y = y1 + (ph + (iy + 0.5) / s) * bin_h
            y_oob = (y < -1.0) | (y > height)
            yc = jnp.clip(y, 0.0, height - 1)
            y0 = jnp.floor(yc)
            ly = yc - y0
            y0i = jnp.minimum(y0.astype(jnp.int32), height - 2)
            y0i = jnp.maximum(y0i, 0)

            top = feat_vmem[y0i].astype(jnp.float32)
            bot = feat_vmem[y0i + 1].astype(jnp.float32)
            ly = jnp.where(y0.astype(jnp.int32) > y0i, 1.0, ly)
            row = top * (1.0 - ly) + bot * ly  # [Wp, C]
            # y-interpolated rows summed over the s sub-samples (linear in wx)
            acc = acc + jnp.where(y_oob, 0.0, row)
        r_vmem[:, ph * c:(ph + 1) * c] = acc.astype(r_vmem.dtype)

    highest = r_vmem.dtype == jnp.float32
    out_all = jax.lax.dot_general(
        wx_bins if highest else wx_bins.astype(r_vmem.dtype),
        r_vmem[...],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST if highest else None,
        preferred_element_type=jnp.float32,
    )  # [P(rows=pw bins), P*C]

    for ph in range(p):
        out_ref[0, 0, ph] = out_all[:, ph * c:(ph + 1) * c].astype(out_ref.dtype)


# VMEM working-set budget for keeping a whole feature map + staged-row
# scratch resident (the chip has ~16 MiB; leave room for the double-buffered
# output blocks + the [P, P*C] matmul result)
_VMEM_FEATURE_BUDGET_BYTES = 13 * 1024 * 1024


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4)
)
def roi_align_pallas_batched(features, rois, output_size=14,
                             spatial_scale=1.0 / 16.0, sampling_ratio=2):
    """ROIAlignV2 (always 'aligned') on TPU: [B,H,W,C], [B,N,4] -> [B,N,P,P,C]."""
    return _forward(features, rois, output_size, spatial_scale, sampling_ratio)


def _forward(features, rois, output_size, spatial_scale, sampling_ratio):
    bsz, h, w, c0 = features.shape
    # Lane alignment: the whole-image DMA slices HBM memrefs whose minor dim
    # must be a multiple of the 128-lane tile (InceptionResNetV2's 1088
    # channels are not) — pad channels up and slice the output back.
    c = ((c0 + 127) // 128) * 128
    if c != c0:
        features = jnp.pad(features, ((0, 0), (0, 0), (0, 0), (0, c - c0)))
    # DMA slices of the HBM feature map need the row dimension aligned to the
    # dtype's sublane tiling (8 for f32, 16 for bf16).
    align = 16 if features.dtype == jnp.bfloat16 else 8
    wp = ((w + align - 1) // align) * align
    if wp != w:
        features = jnp.pad(features, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    n = rois.shape[1]
    p = output_size
    feat_bytes = h * wp * c * features.dtype.itemsize
    r_bytes = wp * p * c * features.dtype.itemsize
    if feat_bytes + r_bytes <= _VMEM_FEATURE_BUDGET_BYTES:
        kernel = functools.partial(
            _kernel_vmem, output_size=p, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, height=h, width=w, padded_width=wp,
            num_rois=n,
        )
        scratch = [
            pltpu.VMEM((h, wp, c), features.dtype),
            pltpu.VMEM((wp, p * c), features.dtype),  # staged y-interp rows
            pltpu.SemaphoreType.DMA,
        ]
        feat_arg = features
    else:
        # feature map too big for VMEM: per-row DMA fallback over the
        # flattened [(B*H), W, C] layout
        kernel = functools.partial(
            _kernel, output_size=p, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, height=h, width=w, padded_width=wp,
            num_rois=n,
        )
        scratch = [
            pltpu.VMEM((2, wp, c), features.dtype),
            pltpu.SemaphoreType.DMA,
        ]
        feat_arg = features.reshape(bsz * h, wp, c)  # free: contiguous layout
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, p, p, c), lambda b_, n_, rois_: (b_, n_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # pooled features come out in the feature dtype: for the bf16
        # pipeline this halves the kernel's write traffic and the backward's
        # incoming-gradient traffic, and removes an 822 MB f32->bf16 cast
        # between pooling and the (bf16) box heads
        out_shape=jax.ShapeDtypeStruct((bsz, n, p, p, c), features.dtype),
    )(rois.reshape(-1), feat_arg)
    return out[..., :c0] if c != c0 else out


def _fwd(features, rois, output_size, spatial_scale, sampling_ratio):
    out = _forward(features, rois, output_size, spatial_scale, sampling_ratio)
    return out, (features, rois)


def _bwd(output_size, spatial_scale, sampling_ratio, residuals, g):
    features, rois = residuals
    from .roi_align_pallas_bwd import roi_align_backward_pallas_batched

    # stochastic_bf16 measured no faster on-chip (the kernel is bound by
    # dynamic-RMW op latency, not accumulator traffic) and adds ~1.6%
    # gradient noise — the exact f32 width-split accumulator stays default
    df = roi_align_backward_pallas_batched(
        g, rois, output_size, spatial_scale, sampling_ratio,
        tuple(features.shape),
    ).astype(features.dtype)
    return df, jnp.zeros_like(rois)


roi_align_pallas_batched.defvjp(_fwd, _bwd)


def roi_align_pallas(features, rois, output_size=14, spatial_scale=1.0 / 16.0,
                     sampling_ratio=2):
    """Single-image wrapper: [H,W,C], [N,4] -> [N,P,P,C] (batch-1 grid)."""
    return roi_align_pallas_batched(
        features[None], rois[None], output_size, spatial_scale, sampling_ratio
    )[0]
