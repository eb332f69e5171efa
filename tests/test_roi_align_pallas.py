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


@pytest.mark.slow
def test_batched_kernel_matches_per_image():
    """grid=(B,N) batched kernel == per-image kernel, fwd and bwd."""
    from unit_tpu.ops.roi_align_pallas import (
        roi_align_pallas, roi_align_pallas_batched,
    )

    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.rand(2, 10, 16, 8).astype(np.float32))
    rois = jnp.asarray(
        np.stack([
            np.array([[8.0, 8.0, 100.0, 80.0], [0.0, 0.0, 60.0, 60.0]]),
            np.array([[16.0, 24.0, 120.0, 120.0], [40.0, 8.0, 90.0, 110.0]]),
        ]).astype(np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        batched = roi_align_pallas_batched(feats, rois, 4, 1.0 / 16.0, 2)
        per_img = jnp.stack([
            roi_align_pallas(feats[b], rois[b], 4, 1.0 / 16.0, 2)
            for b in range(2)
        ])
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(per_img), atol=1e-5
        )

        def loss_b(f):
            return jnp.sum(roi_align_pallas_batched(f, rois, 4, 1.0 / 16.0, 2) ** 2)

        def loss_s(f):
            return sum(
                jnp.sum(roi_align_pallas(f[b], rois[b], 4, 1.0 / 16.0, 2) ** 2)
                for b in range(2)
            )

        gb = jax.grad(loss_b)(feats)
        gs = jax.grad(loss_s)(feats)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gs), atol=1e-4)


@pytest.mark.slow
def test_bwd_split_accumulator_matches(monkeypatch):
    """Split-width VMEM accumulator (forced splits) == XLA VJP."""
    from unit_tpu.ops import roi_align_pallas_bwd as bwd_mod
    from unit_tpu.ops.roi_align_pallas import roi_align_pallas_batched

    # shrink the budget so the 16-wide map needs 2 width slices
    monkeypatch.setattr(bwd_mod, "_VMEM_ACC_BUDGET_BYTES", 10 * 8 * 8 * 4)
    assert bwd_mod._pick_splits(10, 16, 8) == (2, 16)
    # non-divisible padded widths must pad up, not fall back (regression:
    # wp=88 knocked the whole bench shape onto the HBM-RMW fallback)
    assert bwd_mod._pick_splits(10, 24, 8) == (4, 32)

    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.rand(2, 10, 16, 8).astype(np.float32))
    rois = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32))
    rois = rois.at[..., 2:].set(rois[..., :2] + 1.0)
    rois = rois * jnp.asarray([100.0, 60.0, 150.0, 90.0])

    def loss_p(f):
        return jnp.sum(roi_align_pallas_batched(f, rois, 4, 1.0 / 16.0, 2) ** 2)

    def loss_x(f):
        return sum(
            jnp.sum(roi_align_xla(f[b], rois[b], 4, 1.0 / 16.0, 2) ** 2)
            for b in range(2)
        )

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(feats)
    gx = jax.grad(loss_x)(feats)
    # default (non-stochastic) mode stages and accumulates in f32 -> exact
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


def test_fwd_dma_fallback_matches(monkeypatch):
    """Oversized-map row-DMA forward path == XLA (forced via tiny budget)."""
    from unit_tpu.ops import roi_align_pallas as fwd_mod

    monkeypatch.setattr(fwd_mod, "_VMEM_FEATURE_BUDGET_BYTES", 1)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.rand(2, 10, 16, 8).astype(np.float32))
    rois = jnp.asarray(
        np.stack([
            np.array([[8.0, 8.0, 100.0, 80.0], [0.0, 0.0, 60.0, 60.0]]),
            np.array([[16.0, 24.0, 120.0, 120.0], [40.0, 8.0, 90.0, 110.0]]),
        ]).astype(np.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        got = fwd_mod.roi_align_pallas_batched(feats, rois, 4, 1.0 / 16.0, 2)
    ref = jnp.stack([
        roi_align_xla(feats[b], rois[b], 4, 1.0 / 16.0, 2) for b in range(2)
    ])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bwd_small_box_single_rmw_tier(monkeypatch):
    """Small-box single-RMW backward tier (listed kernel, yw-row window) ==
    XLA VJP, including boxes straddling slice/image edges."""
    from unit_tpu.ops import roi_align_pallas_bwd as bwd_mod
    from unit_tpu.ops.roi_align_pallas import roi_align_pallas_batched

    # H=24 >= yw: the small-y tier compiles in; budget forces 2 width slices
    monkeypatch.setattr(bwd_mod, "_VMEM_ACC_BUDGET_BYTES", 24 * 16 * 8 * 4)
    assert bwd_mod._pick_splits(24, 32, 8) == (2, 32)

    feats = jnp.asarray(
        np.random.RandomState(7).rand(2, 24, 32, 8).astype(np.float32)
    )
    rois = jnp.asarray(
        np.array([
            [  # image 0: small boxes (single-RMW path) at various positions
                [20.0, 30.0, 90.0, 100.0],     # ~4x4 feature cells
                [400.0, 40.0, 470.0, 120.0],   # second slice
                [4.0, 350.0, 70.0, 380.0],     # bottom edge
                [240.0, 180.0, 300.0, 230.0],  # slice boundary
            ],
            [  # image 1: mix of small and tall (windowed path) boxes
                [10.0, 10.0, 80.0, 370.0],     # tall -> per-row windowed RMW
                [100.0, 0.0, 460.0, 90.0],     # wide -> full-slice path
                [-30.0, -30.0, 40.0, 40.0],    # off-image corner
                [200.0, 200.0, 210.0, 212.0],  # tiny
            ],
        ]).astype(np.float32)
    )

    def loss_p(f):
        return jnp.sum(roi_align_pallas_batched(f, rois, 4, 1.0 / 16.0, 2) ** 2)

    def loss_x(f):
        return sum(
            jnp.sum(roi_align_xla(f[b], rois[b], 4, 1.0 / 16.0, 2) ** 2)
            for b in range(2)
        )

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(feats)
    gx = jax.grad(loss_x)(feats)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)
