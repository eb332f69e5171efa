"""Visual attention head: prototypes, likelihood, rank losses, meta train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models.visual_attention import VisualAttentionHead, MetaAttention
from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, _strong_batch, _weak_batch


def test_likelihood_prefers_own_prototype():
    head = VisualAttentionHead(num_classes=3, depth=26, mode="mean")
    d = 4
    att = MetaAttention(
        mean=jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 0]]),
        cov_inv=jnp.ones((4, d)),
        logdet=jnp.zeros((4,)),
    )
    q = jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    # likelihood is a pure function of the attention (no params involved)
    sim = VisualAttentionHead.likelihood(head, att, q, np.asarray([0, 1, 2]))
    sim = np.asarray(sim)
    assert sim[0, 0] > sim[0, 1] and sim[0, 0] > sim[0, 2]
    assert sim[1, 1] > sim[1, 0]


@pytest.mark.slow
def test_meta_train_step_with_rank_loss():
    mc = tiny_config(use_meta=True, rank_loss_slots=8)
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    assert "visual_attention" in variables["params"]

    c_base = len(mc.base_ids)
    rng = np.random.RandomState(0)
    meta = {
        "image": jnp.asarray(rng.rand(c_base, 1, 32, 32, 3).astype(np.float32)),
        "boxes": jnp.asarray(
            np.tile(np.asarray([[4.0, 4.0, 28.0, 28.0]], np.float32), (c_base, 1, 1))
        ),
        "class_valid": jnp.ones((c_base,), bool),
    }
    losses = model.apply(
        variables, jax.random.PRNGKey(1), _strong_batch(), _weak_batch(),
        False, meta, method=WSRCNN.train_losses,
    )
    for k in ("loss_rank_margin", "loss_rank_reg", "loss_rank_cls"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_support_stream_is_backbone_detached():
    """Regression: the support-stream backbone pass must be fully detached
    (rcnn.py:315-316 wraps process_meta_data in torch.no_grad()), while the
    meta box head downstream of the pooler still trains from the prototypes
    (roi_heads.py attention forward runs with grad).  Found in round 4: the
    extra support-stream backbone gradients (C*K=15 shots/step) destabilized
    the on-chip meta run into NaN at iter ~700."""
    mc = tiny_config(use_meta=True, rank_loss_slots=8)
    model = WSRCNN(mc=mc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )
    c_base = len(mc.base_ids)
    rng = np.random.RandomState(0)
    meta = {
        "image": jnp.asarray(rng.rand(c_base, 1, 32, 32, 3).astype(np.float32)),
        "boxes": jnp.asarray(
            np.tile(np.asarray([[4.0, 4.0, 28.0, 28.0]], np.float32), (c_base, 1, 1))
        ),
        "class_valid": jnp.ones((c_base,), bool),
    }

    def proto_sum(params):
        att = model.apply(
            {"params": params}, meta, method=WSRCNN.compute_meta_attention
        )
        return jnp.sum(att.mean ** 2)

    grads = jax.grad(proto_sum)(variables["params"])
    backbone_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["backbone"])
    )
    head_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["visual_attention"])
    )
    assert backbone_norm == 0.0, "support stream leaked gradients into the backbone"
    assert head_norm > 0.0, "meta box head must still train from the support stream"


@pytest.mark.slow
def test_matrix_head_nonstandard_feature_dim():
    """sim_matrix sizes itself from res2_out_channels (no 2048 hardcode)."""
    head = VisualAttentionHead(
        num_classes=5, depth=26, res2_out_channels=8, mode="matrix",
        pooler_resolution=4,
    )
    rng = np.random.RandomState(0)
    c, k = 3, 2
    feats = jnp.asarray(rng.rand(c, k, 8, 8, 32).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([[8.0, 8.0, 96.0, 96.0]]), (c, k, 1))[..., :4]
    boxes = boxes.reshape(c, k, 4)
    valid = jnp.ones((c,), bool)
    base_ids = np.asarray([0, 1, 2])
    variables = head.init(
        jax.random.PRNGKey(0), feats, boxes, valid, base_ids,
        method=VisualAttentionHead.support_prototypes,
    )
    d = 8 * 8  # res2_out_channels * 8
    kernel = variables["params"]["sim_matrix"]["kernel"]
    assert kernel.shape == (d, d)
    np.testing.assert_allclose(np.asarray(kernel), np.eye(d))

    att = head.apply(
        variables, feats, boxes, valid, base_ids,
        method=VisualAttentionHead.support_prototypes,
    )
    assert att.mean.shape == (6, d)

    # support_prototypes doesn't touch rank_loss_classifier; init it through
    # rank_loss and merge the two param trees
    pooled = jnp.asarray(rng.rand(4, 4, 4, 32).astype(np.float32))
    v2 = head.init(
        jax.random.PRNGKey(1), pooled, jnp.asarray([0, 1, 2, 5]),
        jnp.ones((4,), bool), att, base_ids,
        method=VisualAttentionHead.rank_loss,
    )
    merged = {"params": {**v2["params"], **variables["params"]}}
    losses = head.apply(
        merged, pooled, jnp.asarray([0, 1, 2, 5]), jnp.ones((4,), bool),
        att, base_ids, method=VisualAttentionHead.rank_loss,
    )
    for key in ("loss_rank_margin", "loss_rank_reg", "loss_rank_cls"):
        assert np.isfinite(float(losses[key])), key
