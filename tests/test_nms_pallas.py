"""Single-kernel Pallas NMS vs the XLA tiled implementation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from unit_tpu.ops.nms import nms_sorted_mask
from unit_tpu.ops.nms_pallas import nms_sorted_mask_pallas
from tests.test_boxes import random_boxes


def _check(n, tile, seed, size=60.0, thr=0.5):
    rng = np.random.RandomState(seed)
    boxes = random_boxes(rng, n, size=size)
    scores = rng.rand(n).astype(np.float32)
    sb = jnp.asarray(boxes[np.argsort(-scores)])
    want = np.asarray(nms_sorted_mask(sb, thr, tile_size=tile))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(nms_sorted_mask_pallas(sb, thr, tile_size=tile))
    np.testing.assert_array_equal(got, want)


def test_matches_xla_dense():
    _check(300, 128, 0, size=40.0)


def test_matches_xla_odd_sizes():
    _check(200, 128, 1)
    _check(130, 64, 2)


def test_matches_xla_sparse():
    _check(256, 128, 3, size=2000.0)  # few suppressions


def test_degenerate_boxes_dropped():
    boxes = np.asarray([[0, 0, 10, 10], [5, 5, 5, 20], [20, 20, 30, 30]], np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(nms_sorted_mask_pallas(jnp.asarray(boxes), 0.5, tile_size=64))
    assert list(got) == [True, False, True]
