"""Exact 1-D k-means on device (globally optimal, deterministic).

Replaces the sklearn KMeans call the reference makes INSIDE the train step
(/root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:465-474) to pick
the top-ranking proposal cluster for PCL.  In 1-D the optimal clusters are
contiguous intervals of the sorted values, so the GLOBAL optimum is found by a
contiguous-partition dynamic program over weighted prefix sums — no init
sensitivity, no host sync, fully jittable, O(k·N²) elementwise work (N is the
static proposal capacity, so the [N+1, N+1] grids are trivial on TPU).

Agreement with the reference's ``sklearn.KMeans(n_clusters=3, random_state=3)``
top-cluster selection is quantified in tests/test_kmeans_sklearn.py: sklearn's
10-restart k-means++ usually reaches the same global optimum, and the residual
disagreements are cases where sklearn lands in a worse local minimum.
"""

from __future__ import annotations

import jax.numpy as jnp


def kmeans_1d(values: jnp.ndarray, valid: jnp.ndarray, k: int = 3):
    """Globally optimal 1-D k-means of the valid entries.

    Returns ``(assignments [N] int32, centers [k])``; invalid entries get
    assignment -1, empty clusters get center ``-inf``.  Cluster ids are in
    ascending center order (clusters are sorted-value intervals).
    """
    n = values.shape[0]
    dtype = values.dtype
    w = valid.astype(dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    # sort by value; invalid entries go to the tail with weight 0 so they
    # contribute nothing to any interval cost
    order = jnp.argsort(jnp.where(valid, values, big))
    xs = jnp.where(valid, values, 0.0)[order]
    ws = w[order]
    zero = jnp.zeros(1, dtype)
    W = jnp.concatenate([zero, jnp.cumsum(ws)])
    S1 = jnp.concatenate([zero, jnp.cumsum(ws * xs)])
    S2 = jnp.concatenate([zero, jnp.cumsum(ws * xs * xs)])

    idx = jnp.arange(n + 1)
    i = idx[:, None]  # interval start (inclusive, sorted position)
    j = idx[None, :]  # interval end (exclusive)
    cw = W[j] - W[i]
    cs = S1[j] - S1[i]
    c2 = S2[j] - S2[i]
    # within-interval squared error of [i, j); 0 for empty/degenerate
    cost = jnp.maximum(c2 - cs * cs / jnp.maximum(cw, 1e-12), 0.0)
    cost = jnp.where(i <= j, cost, jnp.inf)

    # DP over the number of clusters: D[m][j] = best cost of covering [0, j)
    # with m+1 intervals; A[m][j] = the argmin start of the last interval.
    D = cost[0]  # one interval: [0, j)
    args = []
    for _ in range(k - 1):
        tot = D[:, None] + cost  # [i, j]: best m intervals to i, then [i, j)
        A = jnp.argmin(tot, axis=0)
        D = jnp.min(tot, axis=0)
        args.append(A)

    # backtrack the k-1 boundaries from j = n
    bounds = []
    jcur = jnp.asarray(n)
    for A in reversed(args):
        jcur = A[jcur]
        bounds.append(jcur)
    bounds = jnp.stack(bounds[::-1]) if bounds else jnp.zeros((0,), jnp.int32)

    pos = jnp.arange(n)
    seg = jnp.sum(pos[None, :] >= bounds[:, None], axis=0).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros(1, bounds.dtype), bounds])
    ends = jnp.concatenate([bounds, jnp.asarray([n], bounds.dtype)])
    seg_w = W[ends] - W[starts]
    seg_s = S1[ends] - S1[starts]
    centers = jnp.where(seg_w > 0, seg_s / jnp.maximum(seg_w, 1e-12), -jnp.inf)

    assign = jnp.zeros(n, jnp.int32).at[order].set(seg)
    assign = jnp.where(valid, assign, -1)
    return assign, centers


def top_cluster_mask(values: jnp.ndarray, valid: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Membership mask of the cluster with the highest center
    (get_top_ranking_proposals, ref :465-474).  Falls back to the argmax element
    when fewer than k valid values exist (ref :466-467) or the top cluster is
    empty (ref :472-473)."""
    n_valid = jnp.sum(valid.astype(jnp.int32))
    assign, centers = kmeans_1d(values, valid, k)
    top = jnp.argmax(centers)
    mask = (assign == top) & valid
    best = jnp.argmax(jnp.where(valid, values, -jnp.inf))
    fallback = jnp.zeros_like(mask).at[best].set(True)
    mask = jnp.where(n_valid < k, fallback, mask)
    return jnp.where(jnp.any(mask), mask, fallback)
