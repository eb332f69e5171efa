"""ROIAlign (V2 / "aligned" semantics) for TPU.

TPU-native replacement for the Detectron2 CUDA ROIAlignV2 op requested by the
reference configs (``POOLER_TYPE: "ROIAlignV2"``,
/root/reference/configs/VOC/VOC-RCNN-101-C4-split1.yaml:24; SURVEY.md §2.6).

Semantics follow ROIAlignV2 (aligned=True): ROI coordinates are scaled by
``spatial_scale`` and shifted by -0.5 (pixel-center alignment), each output bin
averages ``sampling_ratio`` x ``sampling_ratio`` bilinear samples.  One deliberate
deviation for static shapes: the reference's ``sampling_ratio=0`` means an adaptive
per-ROI sample count, which is data-dependent; we use a fixed sampling ratio
(default 2) — the standard static choice in TPU detection stacks.

The base implementation is pure XLA (gathers fused by the compiler; differentiable
through ``jnp.take``).  ROIs are processed in chunks via ``lax.map`` to bound the
transient gather memory.  A Pallas kernel for the forward path can be swapped in via
``impl='pallas'`` (see unit_tpu/ops/roi_align_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(features: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample ``features`` [H, W, C] at float coords (y, x) [...].

    Out-of-range samples (y < -1 or y > H, same for x) contribute zero, matching
    the CUDA kernel's boundary handling. Returns [..., C].
    """
    h, w, _ = features.shape
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    yc = jnp.clip(y, 0.0, h - 1)
    xc = jnp.clip(x, 0.0, w - 1)

    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = yc - y0
    lx = xc - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    flat = features.reshape(h * w, -1)
    y0i = y0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)

    def g(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    val = (
        g(y0i, x0i) * (hy * hx)[..., None]
        + g(y0i, x1i) * (hy * lx)[..., None]
        + g(y1i, x0i) * (ly * hx)[..., None]
        + g(y1i, x1i) * (ly * lx)[..., None]
    )
    return jnp.where(oob[..., None], 0.0, val)


def _roi_sample_coords(
    rois: jnp.ndarray, output_size: int, spatial_scale: float, sampling_ratio: int,
    aligned: bool,
):
    """Sample coordinates for each ROI: ([N, P*s] ys, [N, P*s] xs)."""
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    if not aligned:
        # legacy ROIAlign forces rois to be at least 1x1 in feature coords
        x2 = jnp.maximum(x2, x1 + 1.0)
        y2 = jnp.maximum(y2, y1 + 1.0)

    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    s = sampling_ratio
    # sample position within a bin: (i + 0.5)/s for i in [0, s)
    frac = (jnp.arange(s, dtype=rois.dtype) + 0.5) / s  # [s]
    bins = jnp.arange(output_size, dtype=rois.dtype)  # [P]
    # [P, s] offsets in units of bins
    grid = bins[:, None] + frac[None, :]
    ys = y1[:, None, None] + bin_h[:, None, None] * grid[None]  # [N, P, s]
    xs = x1[:, None, None] + bin_w[:, None, None] * grid[None]
    return ys.reshape(rois.shape[0], -1), xs.reshape(rois.shape[0], -1)


def roi_align_xla(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk_size: int = 64,
) -> jnp.ndarray:
    """ROIAlign over a single feature map.

    Args:
      features: [H, W, C]
      rois: [N, 4] XYXY boxes in input-image coordinates
    Returns: [N, P, P, C] pooled features.
    """
    n = rois.shape[0]
    p = output_size
    s = sampling_ratio

    def pool_chunk(chunk_rois):
        ys, xs = _roi_sample_coords(chunk_rois, p, spatial_scale, s, aligned)
        # all (y, x) pairs per roi: [n_c, P*s, P*s]
        yy = ys[:, :, None] * jnp.ones_like(xs)[:, None, :]
        xx = jnp.ones_like(ys)[:, :, None] * xs[:, None, :]
        vals = _bilinear_gather(features, yy, xx)  # [n_c, P*s, P*s, C]
        c = vals.shape[-1]
        vals = vals.reshape(-1, p, s, p, s, c)
        return jnp.mean(vals, axis=(2, 4))  # [n_c, P, P, C]

    if n <= chunk_size:
        return pool_chunk(rois)
    n_pad = ((n + chunk_size - 1) // chunk_size) * chunk_size
    rois_p = jnp.pad(rois, ((0, n_pad - n), (0, 0)))
    chunks = rois_p.reshape(-1, chunk_size, 4)
    out = jax.lax.map(pool_chunk, chunks)
    return out.reshape(n_pad, p, p, -1)[:n]


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    impl: str = "xla",
    chunk_size: int = 64,
) -> jnp.ndarray:
    """Dispatching entry point. ``impl``: 'auto' (pallas on TPU, else xla),
    'xla' (pure XLA, differentiable) or 'pallas' (TPU forward kernel with XLA
    custom VJP)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .roi_align_pallas import roi_align_pallas

        return roi_align_pallas(
            features, rois, output_size, spatial_scale, sampling_ratio
        )
    return roi_align_xla(
        features, rois, output_size=output_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, aligned=aligned, chunk_size=chunk_size,
    )


def roi_align_batched(
    features: jnp.ndarray,    # [B, H, W, C]
    rois: jnp.ndarray,        # [B, N, 4]
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    impl: str = "xla",
    chunk_size: int = 64,
) -> jnp.ndarray:
    """Whole-batch ROIAlign -> [B, N, P, P, C].

    On TPU this dispatches to the batch-native Pallas kernel (grid=(B, N)):
    ``jax.vmap`` over the single-image kernel lowers to a sequential per-image
    ``lax.while`` of separate kernel launches, which profiling showed cost
    ~42% of the train step; the batched grid pipelines the whole batch in one
    invocation."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .roi_align_pallas import roi_align_pallas_batched

        return roi_align_pallas_batched(
            features, rois, output_size, spatial_scale, sampling_ratio
        )
    return jax.vmap(
        lambda f, r: roi_align_xla(
            f, r, output_size=output_size, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, aligned=aligned,
            chunk_size=chunk_size,
        )
    )(features, rois)


def roi_pool_max(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """RoIPool (max-pool variant, torchvision semantics) for the VGG-CNN-F "dock"
    configs (``POOLER_TYPE: "ROIPool"``, SURVEY.md §2.6).

    Static-shape approximation: each output bin max-pools a fixed grid of samples
    (nearest-neighbor) covering the bin instead of the data-dependent integer
    sub-window.
    """
    p = output_size
    s = 2  # samples per bin side
    x1 = jnp.floor(rois[:, 0] * spatial_scale)
    y1 = jnp.floor(rois[:, 1] * spatial_scale)
    x2 = jnp.ceil(rois[:, 2] * spatial_scale)
    y2 = jnp.ceil(rois[:, 3] * spatial_scale)
    w = jnp.maximum(x2 - x1, 1.0)
    h = jnp.maximum(y2 - y1, 1.0)

    hgt, wid, c = features.shape
    frac = (jnp.arange(p * s) + 0.5) / (p * s)
    ys = y1[:, None] + h[:, None] * frac[None]  # [N, P*s]
    xs = x1[:, None] + w[:, None] * frac[None]
    yi = jnp.clip(jnp.floor(ys), 0, hgt - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.floor(xs), 0, wid - 1).astype(jnp.int32)
    flat = features.reshape(hgt * wid, c)
    idx = yi[:, :, None] * wid + xi[:, None, :]  # [N, P*s, P*s]
    vals = jnp.take(flat, idx.reshape(idx.shape[0], -1), axis=0)
    vals = vals.reshape(-1, p, s, p, s, c)
    return jnp.max(vals, axis=(2, 4))
