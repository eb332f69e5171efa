"""Vectorized IoU matcher with masked (padded) ground truth.

Reimplements the reference's forked Matcher — which, unlike stock Detectron2, also
returns the per-prediction max-IoU values (`matched_vals`,
/root/reference/modeling/matcher.py:88-98) consumed by the weak detector's fg/bg
ignore thresholds (weak_detector_fast_rcnn.py:330,393).  The TPU version is a pure
function over a static-shape [M, N] quality matrix plus a validity mask for padded
GT rows; all per-level thresholding is branch-free.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp


class MatchResult(NamedTuple):
    matches: jnp.ndarray  # [N] int32 index of matched gt in [0, M)
    labels: jnp.ndarray   # [N] int32 in {-1, 0, 1}
    vals: jnp.ndarray     # [N] float max match quality (0 if no valid gt)


def match(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = False,
) -> MatchResult:
    """Match N predictions against M (padded) ground-truth elements.

    Args:
      quality: [M, N] match quality (e.g. pairwise IoU), all >= 0.
      gt_valid: [M] bool mask of real GT rows.
      thresholds: ascending thresholds, e.g. [0.3, 0.7].
      labels: len(thresholds)+1 labels from {-1, 0, 1}, e.g. [0, -1, 1].
      allow_low_quality_matches: RPN-style rescue of best-anchor-per-gt.
    """
    assert len(labels) == len(thresholds) + 1
    neg_inf = jnp.asarray(-1.0, quality.dtype)
    masked_q = jnp.where(gt_valid[:, None], quality, neg_inf)

    matches = jnp.argmax(masked_q, axis=0).astype(jnp.int32)
    matched_vals = jnp.max(masked_q, axis=0)

    any_gt = jnp.any(gt_valid)
    # With no valid gt the reference returns matches=0, labels=labels[0], vals=0
    # (matcher.py:69-83).
    matched_vals = jnp.where(any_gt, jnp.maximum(matched_vals, 0.0), 0.0)
    matches = jnp.where(any_gt, matches, 0)

    full_thresholds = [-jnp.inf] + list(thresholds) + [jnp.inf]
    out_labels = jnp.full(matches.shape, labels[0], dtype=jnp.int32)
    for lbl, low, high in zip(labels, full_thresholds[:-1], full_thresholds[1:]):
        in_level = (matched_vals >= low) & (matched_vals < high)
        out_labels = jnp.where(in_level, jnp.int32(lbl), out_labels)

    if allow_low_quality_matches:
        # For each valid gt, every prediction tied with its best quality gets label 1
        # (matcher.py:100-119).
        highest_per_gt = jnp.max(jnp.where(gt_valid[:, None], quality, neg_inf), axis=1)
        is_best = (quality == highest_per_gt[:, None]) & gt_valid[:, None]
        rescued = jnp.any(is_best, axis=0)
        out_labels = jnp.where(rescued, jnp.int32(1), out_labels)

    out_labels = jnp.where(any_gt, out_labels, jnp.int32(labels[0]))
    return MatchResult(matches=matches, labels=out_labels, vals=matched_vals)
