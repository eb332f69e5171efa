"""Visual attention (support-prototype) heads.

Rebuild of /root/reference/modeling/roi_heads/visual_attention_head.py: support
shots are ROI-pooled at their GT boxes through a dedicated meta box head; each
class gets a prototype mean (plus a covariance estimate for the Mahalanobis
variant); query ROIs are scored by Gaussian log-likelihood against the
prototypes (:52-58), trained with the margin/regression/classification rank
losses (:101-143).  ``MeanSimilarity`` (identity covariance, the default at
configs/default_config.py:53) and ``MahalanobisSimilarity`` are supported;
support batches are padded [C, K, ...] arrays with a per-class validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.activations import relu

from ..ops import roi_align as roi_align_ops
from .resnet import Res5


@dataclasses.dataclass(frozen=True)
class MetaAttention:
    """Per-class prototypes: mean [C+1, D], cov_inv [C+1, D] (diagonal or
    identity; the full-matrix estimate is reduced to its diagonal for TPU
    memory sanity), logdet [C+1]."""

    mean: jnp.ndarray
    cov_inv: jnp.ndarray
    logdet: jnp.ndarray


class VisualAttentionHead(nn.Module):
    """Meta box head + prototype construction + rank losses."""

    num_classes: int
    depth: int = 50
    res2_out_channels: int = 256  # meta Res5 emits 8x this (feature dim D)
    mode: str = "mean"          # 'mean' | 'mahalanobis' | 'matrix' | 'locatron'
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16.0
    sampling_ratio: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        self.meta_box_head = Res5(
            depth=self.depth, res2_out_channels=self.res2_out_channels,
            dtype=self.dtype, name="meta_box_head",
        )
        self.rank_loss_classifier = nn.Dense(
            self.num_classes + 1, kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros, name="rank_loss_classifier",
        )
        if self.mode in ("matrix", "locatron"):
            # learned similarity matrix (square, feature-dim x feature-dim),
            # identity init (MeanMatrixSimilarity, ref :212-216; Locatron
            # variant :313-360 drops the prototype classification loss and the
            # relu in compute_similarity)
            self.sim_matrix = nn.Dense(
                self.res2_out_channels * 8, use_bias=False,
                kernel_init=lambda key, shape, dtype=jnp.float32: jnp.eye(
                    shape[0], shape[1], dtype=dtype
                ),
                name="sim_matrix",
            )

    def query_features(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """Query ROI features through the (shared-arch, separate-params) meta
        head; gradients flow into the meta head only (ref :81-84).  The matrix
        variant L2-normalizes (ref :231-236)."""
        f = self.meta_box_head(jax.lax.stop_gradient(pooled)).astype(jnp.float32)
        if self.mode in ("matrix", "locatron"):
            f = f / jnp.clip(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)
        return f

    def support_prototypes(
        self,
        support_feats: jnp.ndarray,   # [C, K, h, w, ch] backbone features of shots
        support_boxes: jnp.ndarray,   # [C, K, 4] GT box per shot
        class_valid: jnp.ndarray,     # [C] class has support
        base_ids: np.ndarray,         # [C] dataset class id of each support row
    ) -> MetaAttention:
        """Per-class mean (+ diagonal covariance inverse) prototypes
        (MeanSimilarity/MahalanobisSimilarity.forward)."""
        c, k = support_feats.shape[:2]

        # one batched kernel over all C*K shots (nested vmap of a pallas_call
        # lowers to sequential per-shot while loops on TPU)
        pooled = roi_align_ops.roi_align_batched(
            support_feats.reshape((c * k,) + support_feats.shape[2:]),
            support_boxes.reshape(c * k, 1, 4),
            self.pooler_resolution, self.pooler_scale, self.sampling_ratio,
            impl="auto",
        ).reshape((c, k) + (self.pooler_resolution, self.pooler_resolution)
                  + support_feats.shape[-1:])
        d_feats = self.meta_box_head(
            pooled.reshape((-1,) + pooled.shape[2:])
        ).astype(jnp.float32)
        d = d_feats.shape[-1]
        per_class = d_feats.reshape(c, k, d)
        means = jnp.mean(per_class, axis=1)  # [C, D]
        if self.mode in ("matrix", "locatron"):
            # learned-matrix transform + cosine normalization (ref :299-301)
            means = self.sim_matrix(means)
            means = means / jnp.clip(jnp.linalg.norm(means, -1, keepdims=True), 1e-6)
        if self.mode == "mahalanobis":
            var = jnp.var(per_class, axis=1, ddof=1)  # diagonal covariance
            cov_inv = 1.0 / (var + 1.0)  # ref adds identity before inversion
        else:
            cov_inv = jnp.ones_like(means)

        n_total = self.num_classes + 1
        mean_full = jnp.zeros((n_total, d)).at[base_ids].set(
            jnp.where(class_valid[:, None], means, 0.0)
        )
        cov_full = jnp.zeros((n_total, d)).at[base_ids].set(cov_inv)
        # background slot: zero mean, identity covariance (ref :88-91)
        cov_full = cov_full.at[self.num_classes].set(1.0)
        logdet = jnp.full((n_total,), -jnp.inf).at[base_ids].set(0.0)
        logdet = logdet.at[self.num_classes].set(0.0)
        return MetaAttention(mean=mean_full, cov_inv=cov_full, logdet=logdet)

    def likelihood(self, attention: MetaAttention, query: jnp.ndarray,
                   class_slots: np.ndarray) -> jnp.ndarray:
        """Gaussian likelihood of query features under each selected class slot
        (compute_similarity, ref :52-58). Returns [N, len(class_slots)]."""
        d = query.shape[-1]
        mean = attention.mean[class_slots]
        if self.mode == "matrix":
            # cosine similarity with relu (MeanMatrixSimilarity.compute_similarity)
            return jax.nn.relu(query @ mean.T)
        if self.mode == "locatron":
            return query @ mean.T
        pi_normalizer = 0.5 * d * np.log(2 * np.pi)
        cov_inv = attention.cov_inv[class_slots]
        logdet = attention.logdet[class_slots]
        diff = query[:, None, :] - mean[None, :, :]
        maha = jnp.sum(diff * diff * cov_inv[None], axis=-1)
        log_lik = 0.5 * logdet[None] - pi_normalizer - 0.5 * maha
        return jnp.exp(log_lik)

    def rank_loss(
        self,
        pooled: jnp.ndarray,          # [N, P, P, ch] subsampled query ROI features
        gt_classes: jnp.ndarray,      # [N]
        valid: jnp.ndarray,           # [N]
        attention: MetaAttention,
        base_ids: np.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Margin + reg + prototype-classification losses (ref :101-143; the
        matrix variant's -2 fill / 0.5 bg and fg-masked reg loss, :249-281)."""
        feats = self.query_features(pooled)
        is_matrix = self.mode in ("matrix", "locatron")
        slots = (
            np.asarray(base_ids)
            if is_matrix
            else np.concatenate([base_ids, [self.num_classes]])
        )
        base_sim = self.likelihood(attention, feats, slots)
        n = feats.shape[0]
        fill = -2.0 if is_matrix else 0.0
        sim_full = jnp.full((n, self.num_classes + 1), fill)
        if is_matrix:
            # background contribution 0.5 at the gt slot (ref :262-263)
            sim_full = sim_full.at[
                jnp.arange(n), gt_classes
            ].set(0.5)
        sim_full = sim_full.at[:, slots].set(base_sim)

        gt_scores = jnp.take_along_axis(sim_full, gt_classes[:, None], axis=1)
        dist = gt_scores - sim_full
        is_gt = jax.nn.one_hot(gt_classes, self.num_classes + 1) > 0
        # hinge_embedding_loss(margin=0.5): x where label 1, max(0, 0.5 - x) else
        margin = jnp.where(is_gt, dist, jnp.maximum(0.0, 0.5 - dist))
        margin = margin[:, slots]
        nval = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        margin_loss = jnp.sum(jnp.where(valid[:, None], margin, 0.0)) / (
            nval * len(slots)
        )
        reg = jnp.maximum(0.0, 1.0 - gt_scores[:, 0])
        reg_valid = valid
        if is_matrix:  # only fg examples (ref :272-275)
            reg_valid = valid & (gt_classes < self.num_classes)
        reg_loss = jnp.sum(jnp.where(reg_valid, reg, 0.0)) / jnp.maximum(
            jnp.sum(reg_valid.astype(jnp.float32)), 1.0
        )

        out = {"loss_rank_margin": margin_loss, "loss_rank_reg": reg_loss}
        if self.mode != "locatron":  # Locatron drops the prototype cls loss
            logits = self.rank_loss_classifier(attention.mean[slots])
            logp = jax.nn.log_softmax(logits, axis=-1)
            out["loss_rank_cls"] = -jnp.mean(
                jnp.take_along_axis(logp, jnp.asarray(slots)[:, None], axis=1)
            )
        return out
