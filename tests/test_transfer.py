"""Base->novel transfer math golden tests (fast_rcnn.py:401-426 semantics)."""

import numpy as np
import jax.numpy as jnp

from unit_tpu.models.predictors import (
    combine_cls_logits,
    transfer_deltas,
    transfer_scores,
)
from unit_tpu.models import similarity as S


BASE = np.asarray([0, 1, 3], np.int64)
NOVEL = np.asarray([2, 4], np.int64)
C = 5


def test_transfer_scores_adds_to_novel(rng):
    scores = rng.randn(4, C + 1).astype(np.float32)
    sim = rng.rand(2, 3).astype(np.float32)
    out = np.asarray(transfer_scores(jnp.asarray(scores), jnp.asarray(sim), BASE, NOVEL))
    want = scores.copy()
    want[:, NOVEL] += scores[:, BASE] @ sim.T
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_transfer_scores_per_roi_similarity(rng):
    scores = rng.randn(4, C + 1).astype(np.float32)
    sim = rng.rand(4, 2, 3).astype(np.float32)
    out = np.asarray(transfer_scores(jnp.asarray(scores), jnp.asarray(sim), BASE, NOVEL))
    want = scores.copy()
    for i in range(4):
        want[i, NOVEL] += sim[i] @ scores[i, BASE]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_transfer_deltas_replaces_novel_keeps_base(rng):
    deltas = rng.randn(3, C * 4).astype(np.float32)
    sim = rng.rand(2, 3).astype(np.float32)
    out = np.asarray(
        transfer_deltas(jnp.asarray(deltas), jnp.asarray(sim), BASE, NOVEL, C)
    ).reshape(3, C, 4)
    d4 = deltas.reshape(3, C, 4)
    # base entries kept
    np.testing.assert_allclose(out[:, BASE], d4[:, BASE], atol=1e-6)
    # novel entries REPLACED by the similarity combination (not added)
    want_novel = np.einsum("vb,nbd->nvd", sim, d4[:, BASE])
    np.testing.assert_allclose(out[:, NOVEL], want_novel, atol=1e-5)


def test_combine_cls_logits_means_oicr_iters(rng):
    delta = rng.randn(3, C + 1).astype(np.float32)
    weak = rng.randn(4, 3, C + 1).astype(np.float32)  # 4 OICR iters
    out = np.asarray(combine_cls_logits(jnp.asarray(delta), jnp.asarray(weak)))
    np.testing.assert_allclose(out, delta + weak.mean(0), atol=1e-5)


def test_combine_cls_logits_pads_bg_column(rng):
    delta = rng.randn(3, C + 1).astype(np.float32)
    weak = rng.randn(1, 3, C).astype(np.float32)  # no bg column
    out = np.asarray(combine_cls_logits(jnp.asarray(delta), jnp.asarray(weak)))
    np.testing.assert_allclose(out[:, :C], delta[:, :C] + weak[0], atol=1e-5)
    np.testing.assert_allclose(out[:, C], delta[:, C], atol=1e-6)


def test_lingual_similarity_uses_indexer():
    emb = np.zeros((80, 300), np.float32)
    emb[10, 0] = 1.0  # coco row for class 0
    emb[20, 0] = 2.0  # coco row for class 2 (novel)
    scfg = S.SimilarityConfig(
        terms=(("cls", ("lingual",)),),
        base_ids=(0, 1),
        novel_ids=(2,),
        coco_indexer=(10, 11, 20),
    )
    sim = np.asarray(S.lingual_similarity(jnp.asarray(emb), scfg))
    assert sim.shape == (1, 2)
    assert abs(sim[0, 0] - 2.0) < 1e-6  # novel(2).base(0) dot = 1*2
    assert abs(sim[0, 1]) < 1e-6


def test_similarity_sum_combination_normalized(rng):
    emb = rng.randn(80, 300).astype(np.float32)
    scfg = S.SimilarityConfig(
        terms=(("cls", ("lingual", "visual")), ("bbox", ("lingual",))),
        base_ids=tuple(range(15)),
        novel_ids=tuple(range(15, 20)),
        coco_indexer=tuple(range(20)),
    )
    weak_scores = rng.randn(2, 7, 21).astype(np.float32)
    sims = S.similarity_matrices(
        scfg, embeddings=jnp.asarray(emb), weak_eval_scores=jnp.asarray(weak_scores)
    )
    cls = np.asarray(sims["cls"])
    assert cls.shape == (7, 5, 15)  # per-ROI (visual term present)
    np.testing.assert_allclose(cls.sum(-1), 1.0, atol=1e-4)  # row-normalized
    bbox = np.asarray(sims["bbox"])
    assert bbox.shape == (5, 15)
    np.testing.assert_allclose(bbox.sum(-1), 1.0, atol=1e-4)


def test_similarity_none_term_zeroes(rng):
    scfg = S.SimilarityConfig(
        terms=(("cls", ("None",)),), base_ids=(0, 1), novel_ids=(2,),
        coco_indexer=(0, 1, 2),
    )
    sims = S.similarity_matrices(scfg)
    assert np.all(np.asarray(sims["cls"]) == 0.0)


def test_weight_space_topk_terms(rng):
    w = rng.randn(6, 8).astype(np.float32)  # [C(+1), D] mean OICR weights
    scfg = S.SimilarityConfig(
        terms=(("cls", ("TopK-2",)),), base_ids=(0, 1, 2, 3), novel_ids=(4, 5),
        coco_indexer=tuple(range(6)),
    )
    sims = S.similarity_matrices(scfg, oicr_weight_mean=jnp.asarray(w))
    m = np.asarray(sims["cls"])
    assert m.shape == (2, 4)
    # TopK: uniform over the 2 most similar base classes by weight dot product
    dots = w[[4, 5]] @ w[[0, 1, 2, 3]].T
    for v in range(2):
        top2 = set(np.argsort(-dots[v])[:2])
        nz = set(np.where(m[v] > 0)[0])
        assert nz == top2
        np.testing.assert_allclose(m[v][list(nz)], 0.5, atol=1e-5)


def test_weight_space_wtopk_weighted(rng):
    w = np.abs(rng.randn(6, 8)).astype(np.float32)
    scfg = S.SimilarityConfig(
        terms=(("cls", ("WTopK-2",)),), base_ids=(0, 1, 2, 3), novel_ids=(4, 5),
        coco_indexer=tuple(range(6)),
    )
    m = np.asarray(S.similarity_matrices(scfg, oicr_weight_mean=jnp.asarray(w))["cls"])
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-5)
    assert (np.sort(m, axis=-1)[:, -2:] > 0).all()


def test_lsda_uses_closest_by_distance(rng):
    w = rng.randn(6, 8).astype(np.float32)
    scfg = S.SimilarityConfig(
        terms=(("cls", ("LSDA-1",)),), base_ids=(0, 1, 2, 3), novel_ids=(4, 5),
        coco_indexer=tuple(range(6)),
    )
    m = np.asarray(S.similarity_matrices(scfg, oicr_weight_mean=jnp.asarray(w))["cls"])
    d = np.linalg.norm(w[[4, 5]][:, None] - w[[0, 1, 2, 3]][None], axis=-1)
    for v in range(2):
        assert m[v].argmax() == d[v].argmin()
        np.testing.assert_allclose(m[v].sum(), 1.0, atol=1e-5)


def test_average_term_uniform():
    scfg = S.SimilarityConfig(
        terms=(("cls", ("Average",)),), base_ids=(0, 1, 2), novel_ids=(3,),
        coco_indexer=(0, 1, 2, 3),
    )
    m = np.asarray(S.similarity_matrices(scfg)["cls"])
    np.testing.assert_allclose(m, 1.0 / 3.0, atol=1e-6)
