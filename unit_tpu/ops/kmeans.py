"""Fixed-iteration 1-D k-means on device.

Replaces the sklearn KMeans call the reference makes INSIDE the train step
(/root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:465-474) to pick
the top-ranking proposal cluster for PCL.  sklearn's k-means++ init is replaced by
deterministic quantile init (min/median/max for k=3) + a fixed number of Lloyd
iterations — same role (separate high-score proposals), fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kmeans_1d(
    values: jnp.ndarray,      # [N]
    valid: jnp.ndarray,       # [N]
    k: int = 3,
    iters: int = 10,
):
    """Returns (assignments [N] int32, centers [k]).  Invalid entries get -1."""
    n = values.shape[0]
    big = jnp.asarray(1e30, values.dtype)
    v = jnp.where(valid, values, 0.0)
    vmin = jnp.min(jnp.where(valid, values, big))
    vmax = jnp.max(jnp.where(valid, values, -big))
    centers = vmin + (vmax - vmin) * (jnp.arange(k, dtype=values.dtype) / max(k - 1, 1))

    def step(_, centers):
        d = jnp.abs(values[:, None] - centers[None, :])  # [N, k]
        assign = jnp.argmin(d, axis=-1)
        one_hot = jax.nn.one_hot(assign, k, dtype=values.dtype) * valid[:, None]
        counts = one_hot.sum(0)
        sums = (one_hot * v[:, None]).sum(0)
        return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    assign = jnp.argmin(jnp.abs(values[:, None] - centers[None, :]), axis=-1)
    assign = jnp.where(valid, assign, -1)
    return assign.astype(jnp.int32), centers


def top_cluster_mask(values: jnp.ndarray, valid: jnp.ndarray, k: int = 3,
                     iters: int = 10) -> jnp.ndarray:
    """Membership mask of the cluster with the highest center
    (get_top_ranking_proposals, ref :465-474).  Falls back to the argmax element
    when fewer than k valid values exist."""
    n_valid = jnp.sum(valid.astype(jnp.int32))
    assign, centers = kmeans_1d(values, valid, k, iters)
    top = jnp.argmax(centers)
    mask = (assign == top) & valid
    # fallback: argmax only
    best = jnp.argmax(jnp.where(valid, values, -jnp.inf))
    fallback = jnp.zeros_like(mask).at[best].set(True)
    mask = jnp.where(n_valid < k, fallback, mask)
    # safety: empty cluster -> argmax
    return jnp.where(jnp.any(mask), mask, fallback)
