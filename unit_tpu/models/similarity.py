"""Base -> novel similarity matrices (lingual + visual + weight-space variants).

TPU-native rebuild of WSROIHead.get_similarity_matrices
(/root/reference/modeling/roi_heads/roi_heads.py:245-336) and the class-name
mapping machinery (:190-216).  Supported terms per head type ('cls'/'bbox'/'seg'):
  'lingual'  — GloVe class-name embedding dot products, softmax-normalized
  'visual'   — weak-detector class posteriors on the ROI's own features,
               restricted to base classes, renormalized and thresholded
  'TopK-k' / 'WTopK-k' / 'LSDA-k' — OICR classifier weight-space similarities
  'VisualK-k' — per-ROI top-k of the visual posteriors
  'Average'  — uniform transfer
  'None'     — zero matrix (disables transfer)
combined by 'Sum' (weighted mean, then row-normalized) or elementwise product.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# The 80 COCO category names in model order — used to index the GloVe table
# (mirrors roi_heads.py:191).
COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck",
    "boat", "traffic light", "fire hydrant", "stop sign", "parking meter", "bench",
    "bird", "cat", "dog", "horse", "sheep", "cow", "elephant", "bear", "zebra",
    "giraffe", "backpack", "umbrella", "handbag", "tie", "suitcase", "frisbee",
    "skis", "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
    "skateboard", "surfboard", "tennis racket", "bottle", "wine glass", "cup",
    "fork", "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair", "couch",
    "potted plant", "bed", "dining table", "toilet", "tv", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

# VOC -> COCO synonym remaps (roi_heads.py:194-207).
_VOC_TO_COCO_NAME = {
    "aeroplane": "airplane",
    "diningtable": "dining table",
    "motorbike": "motorcycle",
    "pottedplant": "potted plant",
    "sofa": "couch",
    "tvmonitor": "tv",
}

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat", "chair",
    "cow", "diningtable", "dog", "horse", "motorbike", "person", "pottedplant",
    "sheep", "sofa", "train", "tvmonitor",
]


def coco_indexer_for(class_names: Sequence[str]) -> np.ndarray:
    """Map dataset class names to rows of the 80-class GloVe table."""
    lut = {n: i for i, n in enumerate(COCO_CLASSES)}
    return np.asarray(
        [lut[_VOC_TO_COCO_NAME.get(n, n)] for n in class_names], dtype=np.int32
    )


class SimilarityConfig(NamedTuple):
    terms: Tuple[Tuple[str, Tuple[str, ...]], ...]  # ((head_type, term-names), ...)
    base_ids: Tuple[int, ...]
    novel_ids: Tuple[int, ...]
    coco_indexer: Tuple[int, ...]
    combination: str = "Sum"
    visual_threshold: float = 0.02

    @classmethod
    def from_cfg(cls, cfg, class_names: Sequence[str]) -> "SimilarityConfig":
        terms = [
            ("cls", tuple(cfg.MODEL.ROI_HEADS.FINETUNE_TERMS.CLASSIFIER)),
            ("bbox", tuple(cfg.MODEL.ROI_HEADS.FINETUNE_TERMS.BBOX)),
        ]
        if cfg.MODEL.MASK_ON:
            terms.append(("seg", tuple(cfg.MODEL.ROI_HEADS.FINETUNE_TERMS.MASK)))
        return cls(
            terms=tuple(terms),
            base_ids=tuple(cfg.DATASETS.FEWSHOT.BASE_CLASSES_ID),
            novel_ids=tuple(cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID),
            coco_indexer=tuple(coco_indexer_for(class_names)),
            combination=cfg.MODEL.ROI_HEADS.VISUAL_ATTENTION_HEAD.SIMILARITY_COMBINATION,
            visual_threshold=cfg.MODEL.ROI_HEADS.VISUAL_ATTENTION_HEAD.VISUAL_SIMILARITY_THRESHOLD,
        )


def lingual_similarity(
    embeddings: jnp.ndarray, scfg: SimilarityConfig
) -> jnp.ndarray:
    """[V, B] novel-to-base GloVe dot products (fast_rcnn.py:376-382)."""
    emb = embeddings[np.asarray(scfg.coco_indexer)]
    base = emb[np.asarray(scfg.base_ids)]
    novel = emb[np.asarray(scfg.novel_ids)]
    return novel @ base.T


def visual_similarity(
    weak_eval_scores: jnp.ndarray,  # [K, N, C+1] stacked OICR logits
    scfg: SimilarityConfig,
) -> jnp.ndarray:
    """[N, B] per-ROI base-class posterior similarity (roi_heads.py:250-257)."""
    probs = jnp.mean(weak_eval_scores, axis=0)  # mean of logits over OICR iters
    sim = jax.nn.softmax(probs, axis=-1)[:, np.asarray(scfg.base_ids)]
    sim = sim / jnp.clip(jnp.sum(sim, axis=-1, keepdims=True), 1e-9)
    return jnp.where(sim < scfg.visual_threshold, 0.0, sim)


def _weight_space_matrix(
    oicr_weight_mean: jnp.ndarray,  # [C+1(or C), D] mean OICR classifier weights
    scfg: SimilarityConfig,
    kind: str,
    k: int,
) -> jnp.ndarray:
    """TopK/WTopK/LSDA weight-space transfer matrices (roi_heads.py:273-305)."""
    base_w = oicr_weight_mean[np.asarray(scfg.base_ids)]
    novel_w = oicr_weight_mean[np.asarray(scfg.novel_ids)]
    if kind == "LSDA":
        d = jnp.linalg.norm(novel_w[:, None, :] - base_w[None, :, :], axis=-1)
        _, idx = jax.lax.top_k(-d, k)
        vals = jnp.ones_like(idx, dtype=jnp.float32)
    else:
        sim = novel_w @ base_w.T
        top, idx = jax.lax.top_k(sim, k)
        vals = jnp.ones_like(top) if kind == "TopK" else top
    out = jnp.zeros((len(scfg.novel_ids), len(scfg.base_ids))).at[
        jnp.arange(len(scfg.novel_ids))[:, None], idx
    ].set(vals)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def similarity_matrices(
    scfg: SimilarityConfig,
    embeddings: Optional[jnp.ndarray] = None,
    weak_eval_scores: Optional[jnp.ndarray] = None,
    oicr_weight_mean: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-head-type transfer matrices, [V, B] or [N, V, B] when any per-ROI term
    is present (get_similarity_matrices, roi_heads.py:245-336)."""
    v, b = len(scfg.novel_ids), len(scfg.base_ids)
    ling = None
    vis = None
    all_terms = {t for _, ts in scfg.terms for t in ts}
    if "lingual" in all_terms:
        ling = lingual_similarity(embeddings, scfg)
    if "visual" in all_terms or any(t.startswith("VisualK") for t in all_terms):
        vis = visual_similarity(weak_eval_scores, scfg)

    out = {}
    for head_type, terms in scfg.terms:
        sim = jnp.zeros((v, b))
        if scfg.combination == "Sum":
            weight = 1.0 / max(len(terms), 1)
            if "lingual" in terms:
                sim = sim + weight * jax.nn.softmax(ling, axis=-1)
            for kind in ("TopK", "WTopK", "LSDA"):
                match = [t for t in terms if t.startswith(kind + "-")]
                if match:
                    k = int(match[0].split("-")[1])
                    sim = sim + weight * _weight_space_matrix(oicr_weight_mean, scfg, kind, k)
            vk = [t for t in terms if t.startswith("VisualK-")]
            if vk:
                k = int(vk[0].split("-")[1])
                top, idx = jax.lax.top_k(vis, k)
                per_roi = jnp.zeros_like(vis).at[
                    jnp.arange(vis.shape[0])[:, None], idx
                ].set(top)
                per_roi = per_roi / jnp.clip(jnp.sum(per_roi, -1, keepdims=True), 1e-9)
                sim = sim[None] + weight * per_roi[:, None, :]
            if "visual" in terms:
                sim = (sim[None] if sim.ndim == 2 else sim) + weight * vis[:, None, :]
            if "Average" in terms:
                sim = jnp.ones((v, b))
                sim = sim / jnp.sum(sim, -1, keepdims=True)
            if len(terms) > 0 and "None" not in terms:
                sim = sim / jnp.clip(jnp.sum(sim, axis=-1, keepdims=True), 1e-9)
            else:
                sim = 0.0 * sim
        else:  # product combination (roi_heads.py:325-332)
            sim = jnp.ones((v, b))
            if "lingual" in terms:
                sim = sim * ling
            if "visual" in terms:
                sim = sim[None] * vis[:, None, :]
            if len(terms) > 0:
                sim = jax.nn.softmax(sim, axis=-1)
        out[head_type] = sim
    return out
