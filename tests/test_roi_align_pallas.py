"""Pallas ROIAlign kernel vs the XLA reference (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from unit_tpu.ops.roi_align import roi_align_xla
from unit_tpu.ops.roi_align_pallas import roi_align_pallas


def _compare(feat, rois, p=7, scale=1 / 16.0, s=2, atol=1e-4):
    want = roi_align_xla(jnp.asarray(feat), jnp.asarray(rois), p, scale, s)
    with pltpu.force_tpu_interpret_mode():
        got = roi_align_pallas(jnp.asarray(feat), jnp.asarray(rois), p, scale, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


def test_pallas_matches_xla_basic(rng):
    feat = rng.randn(20, 24, 128).astype(np.float32)
    rois = np.asarray(
        [
            [0.0, 0.0, 320.0, 288.0],
            [32.0, 48.0, 120.0, 200.0],
            [100.0, 10.0, 110.0, 30.0],
            [-20.0, -20.0, 40.0, 40.0],
        ],
        np.float32,
    )
    _compare(feat, rois)


def test_pallas_matches_xla_edge_rois(rng):
    feat = rng.randn(10, 12, 128).astype(np.float32)
    rois = np.asarray(
        [
            [150.0, 140.0, 200.0, 170.0],  # bottom-right corner, partially outside
            [0.0, 0.0, 4.0, 4.0],          # tiny roi near origin
            [0.0, 0.0, 0.0, 0.0],          # degenerate
        ],
        np.float32,
    )
    _compare(feat, rois, atol=2e-4)


def test_pallas_grad_flows(rng):
    feat = jnp.asarray(rng.randn(8, 8, 128).astype(np.float32))
    rois = jnp.asarray([[4.0, 4.0, 60.0, 60.0]])

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(
            lambda f: jnp.sum(roi_align_pallas(f, rois, 4, 1 / 16.0, 2))
        )(feat)
    g_ref = jax.grad(
        lambda f: jnp.sum(roi_align_xla(f, rois, 4, 1 / 16.0, 2))
    )(feat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)
