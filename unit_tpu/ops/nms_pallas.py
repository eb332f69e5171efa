"""Single-kernel Pallas TPU NMS.

The XLA tiled NMS (ops/nms.py) dispatches ~N/T small sequential kernels; this
kernel runs the whole exact-greedy algorithm in one Pallas invocation with the
sorted boxes resident in VMEM:

  * alive mask in VMEM scratch, initialized to nonempty(box)
  * per score-ordered tile: cross-suppression against all earlier rows in
    fixed-size row blocks (elementwise [B, T] IoU on the VPU), then the
    fixed-point self-suppression entirely in-register.

Returns the keep mask over the (padded) sorted boxes; exactness matches the
greedy reference (same tests as ops/nms.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_iou(bx1, by1, bx2, by2, tx1, ty1, tx2, ty2):
    """IoU of rows [B] against tile cols [T] -> [B, T] (broadcast elementwise)."""
    ix1 = jnp.maximum(bx1[:, None], tx1[None, :])
    iy1 = jnp.maximum(by1[:, None], ty1[None, :])
    ix2 = jnp.minimum(bx2[:, None], tx2[None, :])
    iy2 = jnp.minimum(by2[:, None], ty2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
    area_t = jnp.maximum(tx2 - tx1, 0.0) * jnp.maximum(ty2 - ty1, 0.0)
    union = area_b[:, None] + area_t[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def _kernel(boxes_ref, keep_ref, alive_ref, *, n_pad: int, tile: int, block: int,
            iou_threshold: float):
    # boxes_ref is [4, n_pad] (transposed): coordinate rows are lane-contiguous,
    # 128x smaller VMEM footprint than an [n_pad, 4] layout
    t = tile
    nonempty = ((boxes_ref[2, :] - boxes_ref[0, :]) > 0.0) & (
        (boxes_ref[3, :] - boxes_ref[1, :]) > 0.0
    )
    alive_ref[:] = nonempty.astype(jnp.float32)

    num_tiles = n_pad // t
    num_blocks = n_pad // block
    row_ids_block = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
    # strict upper-triangular mask, hoisted out of the tile loop
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    tri = (rows < cols).astype(jnp.float32)

    def tile_body(ti, _):
        start = pl.multiple_of(ti * t, t)
        tx1 = boxes_ref[0, pl.ds(start, t)]
        ty1 = boxes_ref[1, pl.ds(start, t)]
        tx2 = boxes_ref[2, pl.ds(start, t)]
        ty2 = boxes_ref[3, pl.ds(start, t)]

        # cross-suppression: earlier surviving rows kill tile members.
        # (float accumulation: Mosaic can't broadcast-insert a minor dim on
        # sub-32-bit types, so the row mask is carried as f32)
        def block_body(bi, dead):
            bstart = pl.multiple_of(bi * block, block)
            al = alive_ref[pl.ds(bstart, block)]
            earlier = ((row_ids_block + bstart) < start).astype(jnp.float32)
            iou = _pair_iou(
                boxes_ref[0, pl.ds(bstart, block)],
                boxes_ref[1, pl.ds(bstart, block)],
                boxes_ref[2, pl.ds(bstart, block)],
                boxes_ref[3, pl.ds(bstart, block)],
                tx1, ty1, tx2, ty2,
            )
            hit = (iou > iou_threshold).astype(jnp.float32) * (al * earlier)[:, None]
            return jnp.maximum(dead, jnp.max(hit, axis=0))

        dead = jax.lax.fori_loop(
            0, num_blocks, block_body, jnp.zeros((t,), jnp.float32)
        )

        # self-suppression fixed point within the tile
        iou_tile = _pair_iou(tx1, ty1, tx2, ty2, tx1, ty1, tx2, ty2)
        supp = (iou_tile > iou_threshold).astype(jnp.float32) * tri
        alive0 = alive_ref[pl.ds(start, t)] * (1.0 - dead)  # f32 {0, 1}

        # f32 carries only: Mosaic fails to legalize bool-vector while carries
        def cond(carry):
            alive, prev, it = carry
            return jnp.logical_and(it < t, jnp.any(alive != prev))

        def body(carry):
            alive, _, it = carry
            hit = jax.lax.dot_general(
                alive[None, :], supp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[0]
            new = alive0 * jnp.where(hit > 0.0, 0.0, 1.0)
            return (new, alive, it + 1)

        alive, _, _ = jax.lax.while_loop(
            cond, body, (alive0, jnp.full_like(alive0, -1.0), jnp.int32(0))
        )
        alive_ref[pl.ds(start, t)] = alive
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)
    keep_ref[:] = alive_ref[:]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile_size"))
def nms_sorted_mask_pallas(
    sorted_boxes: jnp.ndarray, iou_threshold: float, tile_size: int = 512
) -> jnp.ndarray:
    """Keep mask for score-sorted boxes (drop-in for nms.nms_sorted_mask)."""
    n = sorted_boxes.shape[0]
    # 1-D f32 VMEM slices must start at multiples of 1024 (8x128 tiling), so the
    # tile is at least 1024 regardless of the requested size
    t = max(tile_size, 1024)
    block = t
    n_pad = ((n + block - 1) // block) * block
    boxes = jnp.pad(
        sorted_boxes.astype(jnp.float32), ((0, n_pad - n), (0, 0))
    ).T  # [4, n_pad] lane-contiguous layout
    kernel = functools.partial(
        _kernel, n_pad=n_pad, tile=t, block=min(block, n_pad),
        iou_threshold=iou_threshold,
    )
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_pad,), jnp.float32)],
    )(boxes)
    return keep[:n] > 0.0
