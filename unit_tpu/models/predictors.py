"""Box predictors: weak-detector streams and supervised delta heads.

TPU-native rebuild of the reference's predictor zoo:
  * ``WeakDetectorPredictor`` = WeakDetectorOutputsBase/-FT linear streams
    (/root/reference/modeling/roi_heads/weak_detector_fast_rcnn.py:38-187,522-594):
    two-stream MIL (classifier/detection with temperatures), K OICR refinement
    heads, optional regression branch, and the fine-tune variant that adds
    zero-initialized delta streams on top of novel-masked base streams.
  * ``SupervisedPredictor`` = SupervisedDetectorOutputsBase/-FineTune
    (/root/reference/modeling/roi_heads/fast_rcnn.py:293-533): zero-init
    ``cls_score_delta``/``bbox_pred_delta`` residuals on the frozen weak scores,
    with base->novel transfer applied at inference and optional ``*_ft`` residuals.

These are parameter containers (flax modules); the transfer math lives in
:func:`transfer_scores` / :func:`transfer_deltas` as pure functions so the
fine-tune heads can reuse them with stop-gradient (WeakFineTune,
fast_rcnn.py:557-585).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _dense(features: int, std: float | None, name: str, dtype=jnp.float32) -> nn.Dense:
    """Dense with d2-style init: normal(std) weights (or zeros if std is None),
    zero bias."""
    if std is None:
        kinit = nn.initializers.zeros
    else:
        kinit = nn.initializers.normal(stddev=std)
    return nn.Dense(features, kernel_init=kinit, bias_init=nn.initializers.zeros,
                    dtype=dtype, name=name)


class WeakDetectorPredictor(nn.Module):
    """MIL + OICR linear heads over box features.

    Outputs raw logits; losses/softmaxes are applied by the loss functions in
    unit_tpu/models/weak_losses.py.
    """

    num_classes: int
    oicr_iter: int = 3
    detector_temp: float = 1.0
    classifier_temp: float = 1.0
    regression_branch: bool = False
    oicr_regression_branch: bool = False
    finetune: bool = False
    novel_ids: Sequence[int] = ()
    box_dim: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        c = self.num_classes
        self.classifier_stream = _dense(c, 0.01, "classifier_stream", self.dtype)
        self.detection_stream = _dense(c, 0.01, "detection_stream", self.dtype)
        self.oicr_predictors = [
            _dense(c + 1, 0.01, f"oicr_predictor_{i}", self.dtype)
            for i in range(self.oicr_iter)
        ]
        if self.oicr_regression_branch:
            self.oicr_regressors = [
                _dense(c * self.box_dim, 0.001, f"oicr_regressor_{i}", self.dtype)
                for i in range(self.oicr_iter)
            ]
        if self.regression_branch:
            self.regression_branch_cls = _dense(c + 1, 0.01, "regression_branch_cls", self.dtype)
            self.regression_branch_bbox = _dense(
                c * self.box_dim, 0.001, "regression_branch_bbox", self.dtype
            )
        if self.finetune:
            self.classifier_stream_delta = _dense(c, None, "classifier_stream_delta", self.dtype)
            self.detection_stream_delta = _dense(c, None, "detection_stream_delta", self.dtype)
            self.oicr_predictors_delta = [
                _dense(c + 1, None, f"oicr_predictor_delta_{i}", self.dtype)
                for i in range(self.oicr_iter)
            ]

    def _mask_novel(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero novel-class columns (FT variant, weak_detector_fast_rcnn.py:557-562)."""
        if not len(self.novel_ids):
            return x
        mask = np.ones((x.shape[-1],), np.float32)
        mask[np.asarray(self.novel_ids)] = 0.0
        return x * jnp.asarray(mask)

    def _oicr_logits(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        for i in range(self.oicr_iter):
            o = self.oicr_predictors[i](x)
            if self.finetune:
                o = self._mask_novel(o) + self.oicr_predictors_delta[i](x)
            outs.append(o.astype(jnp.float32))
        return outs

    def __call__(self, x: jnp.ndarray) -> Dict[str, Any]:
        """Training streams (weak_detector_fast_rcnn.py:148-163). x: [N, D]."""
        cls = self.classifier_stream(x) / self.classifier_temp
        det = self.detection_stream(x) / self.detector_temp
        if self.finetune:
            cls = self.classifier_stream_delta(x) / self.classifier_temp + self._mask_novel(cls)
            det = self.detection_stream_delta(x) / self.detector_temp + self._mask_novel(det)
        out = {
            "classifier_stream": cls.astype(jnp.float32),
            "detection_stream": det.astype(jnp.float32),
            "oicr_scores": self._oicr_logits(x),
            "oicr_bbox": [],
            "regression_cls": None,
            "regression_bbox": None,
        }
        if self.oicr_regression_branch:
            out["oicr_bbox"] = [r(x).astype(jnp.float32) for r in self.oicr_regressors]
        if self.regression_branch:
            out["regression_cls"] = self.regression_branch_cls(x).astype(jnp.float32)
            out["regression_bbox"] = self.regression_branch_bbox(x).astype(jnp.float32)
        return out

    def evaluation(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inference-time weak scores (weak_detector_fast_rcnn.py:167-187).

        Returns (cls_scores [K, N, C+1] stacked over OICR iters — or [1, N, *] for
        the non-OICR paths — and bbox deltas [N, C*4]).
        """
        n = x.shape[0]
        zeros_bbox = jnp.zeros((n, self.num_classes * self.box_dim), jnp.float32)
        if self.regression_branch:
            cls = self.regression_branch_cls(x).astype(jnp.float32)[None]
            bbox = self.regression_branch_bbox(x).astype(jnp.float32)
            return cls, bbox
        if self.oicr_iter > 0:
            cls = jnp.stack(self._oicr_logits(x), axis=0)
            if self.oicr_regression_branch:
                bbox = jnp.mean(
                    jnp.stack([r(x).astype(jnp.float32) for r in self.oicr_regressors]), axis=0
                )
            else:
                bbox = zeros_bbox
            return cls, bbox
        cls = (self.classifier_stream(x) / self.classifier_temp).astype(jnp.float32)[None]
        return cls, zeros_bbox


class SupervisedPredictor(nn.Module):
    """Zero-initialized delta heads of the supervised branch."""

    num_classes: int
    regression_branch: bool = False
    finetune: bool = False
    box_dim: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        c = self.num_classes
        self.cls_score_delta = _dense(c + 1, None, "cls_score_delta", self.dtype)
        # fast_rcnn.py:319-323: bbox delta is ~zero (std 0.001), exactly zero when a
        # weak regression branch provides the base regressor.
        bbox_std = None if self.regression_branch else 0.001
        self.bbox_pred_delta = _dense(c * self.box_dim, bbox_std, "bbox_pred_delta", self.dtype)
        if self.finetune:
            self.cls_score_ft = _dense(c + 1, None, "cls_score_ft", self.dtype)
            self.bbox_pred_ft = _dense(c * self.box_dim, None, "bbox_pred_ft", self.dtype)

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {
            "delta_scores": self.cls_score_delta(x).astype(jnp.float32),
            "proposal_deltas": self.bbox_pred_delta(x).astype(jnp.float32),
        }
        if self.finetune:
            out["ft_scores"] = self.cls_score_ft(x).astype(jnp.float32)
            out["ft_deltas"] = self.bbox_pred_ft(x).astype(jnp.float32)
        return out


# --------------------------------------------------------------------------- #
# Base -> novel transfer (pure functions; fast_rcnn.py:401-426)
# --------------------------------------------------------------------------- #

def transfer_scores(
    delta_scores: jnp.ndarray,   # [N, C+1]
    similarity_cls: jnp.ndarray,  # [V, B] or [N, V, B]
    base_ids: np.ndarray,
    novel_ids: np.ndarray,
    detach: bool = False,
) -> jnp.ndarray:
    """Novel-class score columns get the similarity-weighted combination of base
    columns *added* (fast_rcnn.py:405-412)."""
    base = delta_scores[:, base_ids]  # [N, B]
    if similarity_cls.ndim > 2:
        tr = jnp.einsum("nvb,nb->nv", similarity_cls, base)
    else:
        tr = base @ similarity_cls.T  # [N, V]
    if detach:
        tr = jax.lax.stop_gradient(tr)
    return delta_scores.at[:, novel_ids].add(tr)


def transfer_deltas(
    proposal_deltas: jnp.ndarray,  # [N, C*4]
    similarity_bbox: jnp.ndarray,  # [V, B] or [N, V, B]
    base_ids: np.ndarray,
    novel_ids: np.ndarray,
    num_classes: int,
    box_dim: int = 4,
    detach: bool = False,
) -> jnp.ndarray:
    """Novel-class box deltas are *replaced* by the similarity combination of base
    deltas; base deltas kept (fast_rcnn.py:414-423)."""
    n = proposal_deltas.shape[0]
    d4 = proposal_deltas.reshape(n, num_classes, box_dim)
    base = d4[:, base_ids]  # [N, B, 4]
    if similarity_bbox.ndim > 2:
        tr = jnp.einsum("nvb,nbd->nvd", similarity_bbox, base)
    else:
        tr = jnp.einsum("vb,nbd->nvd", similarity_bbox, base)
    if detach:
        tr = jax.lax.stop_gradient(tr)
    out = jnp.zeros_like(d4)
    out = out.at[:, novel_ids].set(tr)
    out = out.at[:, base_ids].set(base)
    return out.reshape(n, num_classes * box_dim)


def combine_cls_logits(
    delta_scores: jnp.ndarray,           # [N, C+1]
    weak_scores: Optional[jnp.ndarray],  # [K, N, C+1] stacked OICR logits, or [K, N, C]
) -> jnp.ndarray:
    """get_cls_logits (fast_rcnn.py:360-368): add the OICR-iteration mean of the
    weak logits; a [*, C] weak head (no bg column) is zero-padded."""
    if weak_scores is None:
        return delta_scores
    mean_weak = jnp.mean(weak_scores, axis=0)
    if mean_weak.shape[-1] == delta_scores.shape[-1] - 1:
        mean_weak = jnp.pad(mean_weak, ((0, 0), (0, 1)))
    return delta_scores + mean_weak
