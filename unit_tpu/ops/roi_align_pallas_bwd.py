"""Pallas TPU kernel for the ROIAlign backward pass (d(out)/d(features)),
batch-native — the TPU equivalent of the CUDA ROIAlignV2 backward the
reference gets from detectron2 (SURVEY.md §2.6 native-dependency table).

The forward kernel (roi_align_pallas.py) made the XLA scatter-add backward the
dominant ROI cost in the train step; this kernel mirrors the forward's design:

  * grid = (B, N) — one program per (image, ROI); wrapping the single-image
    kernel in ``jax.vmap`` lowers to a sequential per-image ``lax.while``
    (measured ~37 ms/stream in the train step), the batched grid keeps all
    images in one pipelined invocation.
  * the incoming gradient block [P, P, C] arrives in VMEM; the
    feature-gradient accumulator lives in HBM flattened to [(B*H), Wp, C],
    zero-initialized by aliasing a zeros operand (Pallas outputs are
    uninitialized otherwise).
  * per output row and y-sample: expand the row gradient to x-samples, matmul
    with the transposed interpolation weight matrix on the MXU
    (d(row) = Wx^T @ g_samples), then read-modify-write the two affected
    feature rows (``b*H + y``) over DMA.  The TPU grid is sequential, so
    cross-ROI accumulation into HBM is race-free.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_pallas import _roi_coords


def _bwd_kernel(rois_ref, g_ref, dfeat_in_ref, dfeat_ref, rows_buf, add_buf, sem,
                *, output_size: int, spatial_scale: float, sampling_ratio: int,
                height: int, width: int, padded_width: int, num_rois: int):
    p = output_size
    s = sampling_ratio
    b = pl.program_id(0)
    n = pl.program_id(1)

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
    wx = jnp.where(x_oob[:, None], 0.0, wx)  # [P*s, Wp]
    # per-bin summed weights: d(row) = wx_bins^T @ (g_row / s^2)
    wx_bins = wx.reshape(p, s, padded_width).sum(axis=1)  # [P, Wp]

    inv_ss = 1.0 / (s * s)
    row0 = b * height

    def row_body(ph, _):
        g_row = g_ref[0, 0, ph].astype(jnp.float32) * inv_ss  # [P, C]

        def sample_body(iy, _):
            y = y1 + (ph + (iy + 0.5) / s) * bin_h
            y_oob = (y < -1.0) | (y > height)
            yc = jnp.clip(y, 0.0, height - 1)
            y0 = jnp.floor(yc)
            ly = yc - y0
            y0i = jnp.minimum(y0.astype(jnp.int32), height - 2)
            y0i = jnp.maximum(y0i, 0)
            ly = jnp.where(y0.astype(jnp.int32) > y0i, 1.0, ly)

            # d(row_interp) = wx_bins^T @ g_row  [Wp, C] on the MXU
            d_row = jax.lax.dot_general(
                wx_bins, g_row, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            d_row = jnp.where(y_oob, 0.0, d_row)

            # read-modify-write the two affected feature rows
            rd = pltpu.make_async_copy(
                dfeat_ref.at[pl.ds(row0 + y0i, 2)], rows_buf, sem
            )
            rd.start()
            rd.wait()
            add_buf[0] = rows_buf[0] + d_row * (1.0 - ly)
            add_buf[1] = rows_buf[1] + d_row * ly
            wr = pltpu.make_async_copy(
                add_buf, dfeat_ref.at[pl.ds(row0 + y0i, 2)], sem
            )
            wr.start()
            wr.wait()
            return 0

        jax.lax.fori_loop(0, s, sample_body, 0)
        return 0

    jax.lax.fori_loop(0, p, row_body, 0)


def _bwd_kernel_vmem(rois_ref, g_ref, dfeat_ref, acc_ref, sem, *,
                     output_size: int, spatial_scale: float,
                     sampling_ratio: int, height: int, width: int,
                     half_width: int, num_rois: int,
                     stochastic: bool = False):
    """VMEM-accumulator variant: the feature gradient is accumulated in a
    persistent [H, Wh, C] f32 VMEM scratch (one width-slice of the map at a
    time, grid=(B, splits, N)) and written to HBM once per (image, slice) —
    the RMW variant's two-row read+write DMAs per y-sample cost ~11 GB of HBM
    traffic per 512 ROIs and dominated the train step's backward."""
    p = output_size
    s = sampling_ratio
    b = pl.program_id(0)
    hsplit = pl.program_id(1)
    n = pl.program_id(2)
    hoff = hsplit * half_width
    if stochastic:
        # per-program seed: stochastic rounding of the bf16 accumulator needs
        # independent bits per (image, slice, roi)
        pltpu.prng_seed(n + num_rois * (hsplit + pl.num_programs(1) * b))

    @pl.when(n == 0)
    def _zero_acc():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x1, y1, x2, y2 = _roi_coords(rois_ref, b, n, num_rois, spatial_scale)

    # Skip ROIs whose x-support does not touch THIS width slice at all: with
    # the grid iterating every ROI in every slice, a typical narrow proposal
    # otherwise pays the full matmul + accumulator RMW cost in slices where
    # its weight matrix is entirely zero.  The bilinear taps of clipped
    # samples reach one column beyond [x1, x2] on each side.
    x_sup_lo = jnp.floor(jnp.minimum(x1, x2)) - 1.0
    x_sup_hi = jnp.ceil(jnp.maximum(x1, x2)) + 1.0
    overlaps = (x_sup_hi >= hoff) & (x_sup_lo < hoff + half_width)

    import math as _math

    # All s y-samples of ONE output row land inside a static WROWS-row window:
    # sample spread = bin_h*(s-1)/s <= bin_h <= H/p, plus 2 rows of bilinear
    # support.  A single [WROWS, ncols, C] RMW per output row replaces the s
    # separate [2, ncols, C] RMWs — the kernel is bound on this accumulator
    # traffic (was ~45 GB per 1024 ROIs before the merge).
    wrows = min(height, int(_math.ceil((height / p) * (s - 1) / max(s, 1))) + 2)
    # static x-window for narrow ROIs: multiple of the 8-sublane tile, covering
    # boxes up to (XW-3) feature columns wide; wider ROIs take the full-slice
    # path.  Narrow proposals dominate RPN outputs, so most ROIs touch a
    # quarter-width window instead of the whole slice.
    xw = 16
    bin_h = (y2 - y1) / p
    bin_w = (x2 - x1) / p

    def _accum(ncols, col0):
        """Accumulate this ROI's gradient into acc columns [col0, col0+ncols).

        col0 is a traced absolute column index (sublane-aligned); ncols is
        static.  The x-weight matrix is built directly in window coordinates,
        so support outside the window contributes exactly zero."""
        ks = jax.lax.broadcasted_iota(jnp.int32, (p * s, 1), 0)[:, 0].astype(
            jnp.float32
        )
        frac = ((ks % s) + 0.5) / s
        bins = jnp.floor(ks / s)
        xs = x1 + (bins + frac) * bin_w
        x_oob = (xs < -1.0) | (xs > width)
        xc = jnp.clip(xs, 0.0, width - 1)
        x0 = jnp.floor(xc)
        lx = xc - x0
        cols = jax.lax.broadcasted_iota(jnp.int32, (p * s, ncols), 1) + col0
        cols = cols.astype(jnp.float32)
        x0b = x0[:, None]
        x1b = jnp.minimum(x0 + 1, width - 1)[:, None]
        wx = jnp.where(cols == x0b, (1.0 - lx)[:, None], 0.0)
        wx = wx + jnp.where(cols == x1b, lx[:, None], 0.0)
        wx = jnp.where(x_oob[:, None], 0.0, wx)  # [P*s, ncols]
        # fold the x-sample-pair sum and the 1/s^2 bin average into the weights
        wx_bins = wx.reshape(p, s, ncols).sum(axis=1) / (s * s)  # [P, ncols]

        c = g_ref.shape[-1]
        # stage all bin rows of the incoming gradient side-by-side: [P, P*C];
        # one [P, ncols]^T x [P, P*C] matmul then yields every output row's
        # d(row) at once instead of P*s small dependent MXU ops per ROI
        g_all = jnp.concatenate(
            [g_ref[0, 0, ph].astype(jnp.float32) for ph in range(p)], axis=-1
        )
        # bf16 staging only in stochastic mode (halves the value's VMEM
        # footprint); the f32 mode keeps the gradient path exact
        d_all = jax.lax.dot_general(
            wx_bins, g_all, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16 if stochastic else jnp.float32)  # [ncols, P*C]

        # column offset inside this slice's accumulator; built from
        # 8-aligned quantities, which Mosaic needs asserted for the dynamic
        # sublane-dimension slice below
        crel = pl.multiple_of(col0 - hoff, 8)
        for ph in range(p):
            d_row = d_all[:, ph * c:(ph + 1) * c].astype(jnp.float32)
            base = None
            offs, los, oobs = [], [], []
            for iy in range(s):
                y = y1 + (ph + (iy + 0.5) / s) * bin_h
                y_oob = (y < -1.0) | (y > height)
                yc = jnp.clip(y, 0.0, height - 1)
                y0 = jnp.floor(yc)
                ly = yc - y0
                y0i = jnp.minimum(y0.astype(jnp.int32), height - 2)
                y0i = jnp.maximum(y0i, 0)
                ly = jnp.where(y0.astype(jnp.int32) > y0i, 1.0, ly)
                base = y0i if base is None else jnp.minimum(base, y0i)
                offs.append(y0i)
                los.append(ly)
                oobs.append(y_oob)
            base = jnp.clip(base, 0, height - wrows)
            # per-window-row weight: sum of each sample's two bilinear taps
            rows = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0)[:, 0]
            w4 = jnp.zeros((wrows,), jnp.float32)
            for iy in range(s):
                o = offs[iy] - base
                li = jnp.where(oobs[iy], 0.0, los[iy])
                top = jnp.where(oobs[iy], 0.0, 1.0 - los[iy])
                w4 = w4 + jnp.where(rows == o, top, 0.0) + jnp.where(
                    rows == o + 1, li, 0.0
                )
            upd = d_row[None] * w4[:, None, None]  # [WROWS, ncols, C]
            new = acc_ref[
                pl.ds(base, wrows), pl.ds(crel, ncols)
            ].astype(jnp.float32) + upd
            if stochastic:
                # bf16 accumulator + stochastic rounding: halves the RMW
                # traffic; SR keeps the ~30-100-contribution sums unbiased
                bits = jax.lax.bitcast_convert_type(
                    pltpu.prng_random_bits(new.shape), jnp.uint32
                )
                new = pltpu.stochastic_round(
                    new, bits, target_dtype=jnp.bfloat16
                )
            acc_ref[pl.ds(base, wrows), pl.ds(crel, ncols)] = new.astype(
                acc_ref.dtype
            )

    # xw-8 threshold: the window start is aligned DOWN to the 8-sublane tile,
    # which can cost up to 7 columns of slack, and slice-boundary clamping is
    # covered by the same margin (see the case analysis in the commit message)
    narrow = (x_sup_hi - x_sup_lo) <= (xw - 8)
    if xw < half_width:
        @pl.when(overlaps & narrow)
        def _roi_narrow():
            # 8-sublane-aligned window start, clamped inside this slice
            col0 = jnp.floor(x_sup_lo / 8.0).astype(jnp.int32) * 8
            col0 = jnp.clip(col0, hoff, hoff + half_width - xw)
            _accum(xw, col0)

        @pl.when(overlaps & ~narrow)
        def _roi_full():
            _accum(half_width, hoff)
    else:
        @pl.when(overlaps)
        def _roi_any():
            _accum(half_width, hoff)

    @pl.when(n == num_rois - 1)
    def _flush():
        wr = pltpu.make_async_copy(
            acc_ref, dfeat_ref.at[b, :, pl.ds(hoff, half_width)], sem
        )
        wr.start()
        wr.wait()


def _bwd_kernel_vmem_listed(rois_ref, idx_ref, counts_ref, g_hbm, dfeat_ref,
                            acc_ref, g_buf, sem, out_sem, *,
                            output_size: int, spatial_scale: float,
                            sampling_ratio: int, height: int, width: int,
                            half_width: int, num_rois: int, num_splits: int,
                            stochastic: bool = False):
    """Listed variant of the VMEM-accumulator backward (round-3): grid is
    (B, splits) only; the ROIs touching each width slice arrive as a
    host-compacted index list (scalar prefetch) and their gradient blocks are
    manually double-buffered from HBM.  The (B, splits, N) grid re-fetched
    every ROI's 400 KB g block once per slice (~4x redundant HBM traffic) and
    paid ~4096 grid steps; here each block moves at most once per slice it
    actually touches, overlapped with the previous ROI's compute."""
    p = output_size
    s = sampling_ratio
    b = pl.program_id(0)
    hsplit = pl.program_id(1)
    hoff = hsplit * half_width
    base = (b * num_splits + hsplit) * num_rois
    count = counts_ref[b * num_splits + hsplit]
    if stochastic:
        pltpu.prng_seed(hsplit + num_splits * b)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def fetch(i, slot):
        n = idx_ref[base + i]
        return pltpu.make_async_copy(g_hbm.at[b, n], g_buf.at[slot], sem.at[slot])

    @pl.when(count > 0)
    def _prime():
        fetch(0, 0).start()

    import math as _math

    wrows = min(height, int(_math.ceil((height / p) * (s - 1) / max(s, 1))) + 2)
    xw = 16

    def roi_body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < count)
        def _next():
            fetch(i + 1, 1 - slot).start()

        fetch(i, slot).wait()
        n = idx_ref[base + i]
        x1, y1, x2, y2 = _roi_coords(rois_ref, b, n, num_rois, spatial_scale)
        bin_h = (y2 - y1) / p
        bin_w = (x2 - x1) / p
        x_sup_lo = jnp.floor(jnp.minimum(x1, x2)) - 1.0
        x_sup_hi = jnp.ceil(jnp.maximum(x1, x2)) + 1.0

        def _d_all(ncols, col0):
            ks = jax.lax.broadcasted_iota(jnp.int32, (p * s, 1), 0)[:, 0].astype(
                jnp.float32
            )
            frac = ((ks % s) + 0.5) / s
            bins = jnp.floor(ks / s)
            xs = x1 + (bins + frac) * bin_w
            x_oob = (xs < -1.0) | (xs > width)
            xc = jnp.clip(xs, 0.0, width - 1)
            x0 = jnp.floor(xc)
            lx = xc - x0
            cols = jax.lax.broadcasted_iota(jnp.int32, (p * s, ncols), 1) + col0
            cols = cols.astype(jnp.float32)
            x0b = x0[:, None]
            x1b = jnp.minimum(x0 + 1, width - 1)[:, None]
            wx = jnp.where(cols == x0b, (1.0 - lx)[:, None], 0.0)
            wx = wx + jnp.where(cols == x1b, lx[:, None], 0.0)
            wx = jnp.where(x_oob[:, None], 0.0, wx)
            wx_bins = wx.reshape(p, s, ncols).sum(axis=1) / (s * s)

            # the g blocks arrive with pw padded to the sublane tile (ppad);
            # zero weight rows make the pad rows contribute nothing
            ppad = g_buf.shape[2]
            if ppad != p:
                wx_bins = jnp.pad(wx_bins, ((0, ppad - p), (0, 0)))

            c = g_buf.shape[-1]
            g_all = jnp.concatenate(
                [g_buf[slot, ph].astype(jnp.float32) for ph in range(p)], axis=-1
            )  # [ppad(pw), P_ph*C]
            return jax.lax.dot_general(
                wx_bins, g_all, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16 if stochastic else jnp.float32)

        def _y_taps(ph):
            """(offs, los, oobs) for the s y-samples of output row ph."""
            offs, los, oobs = [], [], []
            for iy in range(s):
                y = y1 + (ph + (iy + 0.5) / s) * bin_h
                y_oob = (y < -1.0) | (y > height)
                yc = jnp.clip(y, 0.0, height - 1)
                y0 = jnp.floor(yc)
                ly = yc - y0
                y0i = jnp.minimum(y0.astype(jnp.int32), height - 2)
                y0i = jnp.maximum(y0i, 0)
                ly = jnp.where(y0.astype(jnp.int32) > y0i, 1.0, ly)
                offs.append(y0i)
                los.append(ly)
                oobs.append(y_oob)
            return offs, los, oobs

        yw = 16  # single-RMW window for small boxes (ROI y-support <= yw rows)

        def _accum_small(ncols, col0):
            """Small-box fast path: ALL 14 output rows' updates land inside one
            static yw-row window -> ONE accumulator RMW per ROI instead of p.
            Typical RPN proposals (< yw*16 px tall at stride 16) take this
            path; it cuts the accumulator traffic ~3.6x (p x [wrows, ncols, C]
            -> 1 x [yw, ncols, C]) and removes p-1 dynamic-slice round trips."""
            d_all = _d_all(ncols, col0)
            c = g_buf.shape[-1]
            # first possibly-touched feature row (same clip chain as the
            # per-sample y0i, so every o = y0i - base_row is in [0, yw-2])
            y_min = jnp.minimum(y1, y2)
            lo_i = jnp.clip(
                jnp.floor(jnp.clip(y_min, 0.0, height - 1.0)).astype(jnp.int32),
                0, height - 2,
            )
            base_row = jnp.clip(lo_i, 0, height - yw)
            rows = jax.lax.broadcasted_iota(jnp.int32, (yw, 1), 0)[:, 0]
            upd = jnp.zeros((yw, ncols, c), jnp.float32)
            for ph in range(p):
                offs, los, oobs = _y_taps(ph)
                w16 = jnp.zeros((yw,), jnp.float32)
                for iy in range(s):
                    o = offs[iy] - base_row
                    li = jnp.where(oobs[iy], 0.0, los[iy])
                    top = jnp.where(oobs[iy], 0.0, 1.0 - los[iy])
                    w16 = w16 + jnp.where(rows == o, top, 0.0) + jnp.where(
                        rows == o + 1, li, 0.0
                    )
                d_row = d_all[:, ph * c:(ph + 1) * c].astype(jnp.float32)
                upd = upd + d_row[None] * w16[:, None, None]
            crel = pl.multiple_of(col0 - hoff, 8)
            new = acc_ref[
                pl.ds(base_row, yw), pl.ds(crel, ncols)
            ].astype(jnp.float32) + upd
            if stochastic:
                bits = jax.lax.bitcast_convert_type(
                    pltpu.prng_random_bits(new.shape), jnp.uint32
                )
                new = pltpu.stochastic_round(new, bits, target_dtype=jnp.bfloat16)
            acc_ref[pl.ds(base_row, yw), pl.ds(crel, ncols)] = new.astype(
                acc_ref.dtype
            )

        def _accum(ncols, col0):
            d_all = _d_all(ncols, col0)
            c = g_buf.shape[-1]
            crel = pl.multiple_of(col0 - hoff, 8)
            for ph in range(p):
                d_row = d_all[:, ph * c:(ph + 1) * c].astype(jnp.float32)
                base_row = None
                offs, los, oobs = [], [], []
                for iy in range(s):
                    y = y1 + (ph + (iy + 0.5) / s) * bin_h
                    y_oob = (y < -1.0) | (y > height)
                    yc = jnp.clip(y, 0.0, height - 1)
                    y0 = jnp.floor(yc)
                    ly = yc - y0
                    y0i = jnp.minimum(y0.astype(jnp.int32), height - 2)
                    y0i = jnp.maximum(y0i, 0)
                    ly = jnp.where(y0.astype(jnp.int32) > y0i, 1.0, ly)
                    base_row = y0i if base_row is None else jnp.minimum(base_row, y0i)
                    offs.append(y0i)
                    los.append(ly)
                    oobs.append(y_oob)
                base_row = jnp.clip(base_row, 0, height - wrows)
                rows = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1), 0)[:, 0]
                w4 = jnp.zeros((wrows,), jnp.float32)
                for iy in range(s):
                    o = offs[iy] - base_row
                    li = jnp.where(oobs[iy], 0.0, los[iy])
                    top = jnp.where(oobs[iy], 0.0, 1.0 - los[iy])
                    w4 = w4 + jnp.where(rows == o, top, 0.0) + jnp.where(
                        rows == o + 1, li, 0.0
                    )
                upd = d_row[None] * w4[:, None, None]
                new = acc_ref[
                    pl.ds(base_row, wrows), pl.ds(crel, ncols)
                ].astype(jnp.float32) + upd
                if stochastic:
                    bits = jax.lax.bitcast_convert_type(
                        pltpu.prng_random_bits(new.shape), jnp.uint32
                    )
                    new = pltpu.stochastic_round(
                        new, bits, target_dtype=jnp.bfloat16
                    )
                acc_ref[pl.ds(base_row, wrows), pl.ds(crel, ncols)] = new.astype(
                    acc_ref.dtype
                )

        narrow = (x_sup_hi - x_sup_lo) <= (xw - 8)
        if xw < half_width and height >= yw:
            lo_i = jnp.clip(
                jnp.floor(
                    jnp.clip(jnp.minimum(y1, y2), 0.0, height - 1.0)
                ).astype(jnp.int32), 0, height - 2,
            )
            hi_i = jnp.clip(
                jnp.floor(
                    jnp.clip(jnp.maximum(y1, y2), 0.0, height - 1.0)
                ).astype(jnp.int32), 0, height - 2,
            )
            small_y = (hi_i - lo_i) <= (yw - 2)

            @pl.when(narrow & small_y)
            def _roi_small():
                col0 = jnp.floor(x_sup_lo / 8.0).astype(jnp.int32) * 8
                col0 = jnp.clip(col0, hoff, hoff + half_width - xw)
                _accum_small(xw, col0)

            @pl.when(narrow & ~small_y)
            def _roi_narrow():
                col0 = jnp.floor(x_sup_lo / 8.0).astype(jnp.int32) * 8
                col0 = jnp.clip(col0, hoff, hoff + half_width - xw)
                _accum(xw, col0)

            @pl.when(~narrow)
            def _roi_full():
                _accum(half_width, hoff)
        elif xw < half_width:
            @pl.when(narrow)
            def _roi_narrow2():
                col0 = jnp.floor(x_sup_lo / 8.0).astype(jnp.int32) * 8
                col0 = jnp.clip(col0, hoff, hoff + half_width - xw)
                _accum(xw, col0)

            @pl.when(~narrow)
            def _roi_full2():
                _accum(half_width, hoff)
        else:
            _accum(half_width, hoff)
        return 0

    jax.lax.fori_loop(0, count, roi_body, 0)

    wr = pltpu.make_async_copy(
        acc_ref, dfeat_ref.at[b, :, pl.ds(hoff, half_width)], out_sem
    )
    wr.start()
    wr.wait()


def _slice_roi_lists(rois, spatial_scale, half_width, splits):
    """Per-(image, slice) compacted lists of ROI indices whose x-support
    touches the slice, plus counts — plain XLA, O(B*S*N)."""
    sc = spatial_scale
    x1 = rois[..., 0] * sc - 0.5
    x2 = rois[..., 2] * sc - 0.5
    x_lo = jnp.floor(jnp.minimum(x1, x2)) - 1.0   # [B, N]
    x_hi = jnp.ceil(jnp.maximum(x1, x2)) + 1.0
    lo_b = (jnp.arange(splits) * half_width)[None, :, None].astype(jnp.float32)
    overlap = (x_hi[:, None, :] >= lo_b) & (x_lo[:, None, :] < lo_b + half_width)
    order = jnp.argsort(~overlap, axis=-1, stable=True).astype(jnp.int32)
    counts = overlap.sum(-1).astype(jnp.int32)
    return order.reshape(-1), counts.reshape(-1)


# budget for the VMEM gradient accumulator slice (chip VMEM ~16 MiB, leave
# room for the double-buffered incoming-gradient blocks + staged matmuls)
_VMEM_ACC_BUDGET_BYTES = 6 * 1024 * 1024


def _pick_splits(h: int, wp: int, c: int, itemsize: int = 4):
    """(num_splits, padded_total_width) — wp is padded UP so every slice is
    sublane-aligned; requiring exact divisibility silently knocked common
    widths (e.g. 88 = 84 padded to 8) onto the slow HBM-RMW fallback."""
    for k in (1, 2, 4, 8, 16):
        wp_eff = ((wp + k * 8 - 1) // (k * 8)) * (k * 8)
        if h * (wp_eff // k) * c * itemsize <= _VMEM_ACC_BUDGET_BYTES:
            return k, wp_eff
    return 0, wp  # no feasible slice -> HBM read-modify-write fallback


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def roi_align_backward_pallas_batched(
    g: jnp.ndarray,        # [B, N, P, P, C] output gradient
    rois: jnp.ndarray,     # [B, N, 4]
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int,
    feature_shape=None,    # (B, H, W, C)
    stochastic_bf16: bool = False,
) -> jnp.ndarray:
    """stochastic_bf16: accumulate in bf16 with stochastic rounding (for the
    bf16 production pipeline, where the gradient leaves this op as bf16
    anyway) — halves the VMEM RMW traffic this kernel is bound on."""
    bsz, h, w, c0 = feature_shape
    # lane alignment: pad channels to the 128-lane tile (e.g. InceptionResNetV2
    # has 1088) and slice the gradient back at the end
    c = ((c0 + 127) // 128) * 128
    if c != c0:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, 0), (0, c - c0)))
    wp = ((w + 7) // 8) * 8
    n = rois.shape[1]
    p = output_size
    acc_dtype = jnp.bfloat16 if stochastic_bf16 else jnp.float32
    itemsize = 2 if stochastic_bf16 else 4
    splits, wp_eff = _pick_splits(h, wp, c, itemsize)
    use_listed = os.environ.get("UNIT_TPU_BWD_LISTED", "1") != "0"
    if splits and use_listed:
        wp = wp_eff
        half_width = wp // splits
        idx, counts = _slice_roi_lists(rois, spatial_scale, half_width, splits)
        # manual HBM->VMEM block DMA needs the sublane (pw) dim aligned to the
        # tile; pad pw and give the pad rows zero interpolation weight
        sub = 16 if g.dtype == jnp.bfloat16 else 8
        ppad = ((p + sub - 1) // sub) * sub
        g_padded = (
            jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, ppad - p), (0, 0)))
            if ppad != p else g
        )
        kernel = functools.partial(
            _bwd_kernel_vmem_listed, output_size=p, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, height=h, width=w,
            half_width=half_width, num_rois=n, num_splits=splits,
            stochastic=stochastic_bf16,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bsz, splits),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # g stays in HBM
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((h, half_width, c), acc_dtype),
                pltpu.VMEM((2, p, ppad, c), g.dtype),  # double-buffered g blocks
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, h, wp, c), acc_dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(rois.reshape(-1), idx, counts, g_padded)
        return out[:, :, :w, :c0]
    if splits:
        wp = wp_eff
        half_width = wp // splits
        kernel = functools.partial(
            _bwd_kernel_vmem, output_size=p, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, height=h, width=w,
            half_width=half_width, num_rois=n, stochastic=stochastic_bf16,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, splits, n),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, p, p, c),
                    lambda b_, h_, n_, rois_: (b_, n_, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((h, half_width, c), acc_dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, h, wp, c), acc_dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            # g stays in its native dtype (bf16 in production): the kernel
            # converts per-row in VMEM. An f32 upcast here materialized an
            # 822 MB convert+layout copy per stream in the step trace.
        )(rois.reshape(-1), g)
        return out[:, :, :w, :c0]

    kernel = functools.partial(
        _bwd_kernel, output_size=p, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, height=h, width=w, padded_width=wp,
        num_rois=n,
    )
    zeros = jnp.zeros((bsz * h, wp, c), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n),
        in_specs=[
            pl.BlockSpec(
                (1, 1, p, p, c), lambda b_, n_, rois_: (b_, n_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # zeros -> aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, wp, c), jnp.float32),
            pltpu.VMEM((2, wp, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz * h, wp, c), jnp.float32),
        input_output_aliases={2: 0},  # zeros operand (after scalar prefetch)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rois.reshape(-1), g, zeros)
    return out.reshape(bsz, h, wp, c)[:, :, :w, :c0]


def roi_align_backward_pallas(
    g: jnp.ndarray,        # [N, P, P, C]
    rois: jnp.ndarray,     # [N, 4]
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int,
    feature_shape=None,    # (H, W, C)
) -> jnp.ndarray:
    """Single-image wrapper over the batched kernel."""
    h, w, c = feature_shape
    return roi_align_backward_pallas_batched(
        g[None], rois[None], output_size, spatial_scale, sampling_ratio,
        (1, h, w, c),
    )[0]
