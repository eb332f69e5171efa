"""Pin the reference's Gaussian rank-loss likelihood underflow.

The reference's MeanSimilarity/MahalanobisSimilarity likelihood is
exp(0.5*logdet - 0.5*D*log(2pi) - 0.5*maha) with D = 2048
(/root/reference/modeling/roi_heads/visual_attention_head.py:46,73-79).
The -0.5*2048*log(2pi) ~= -1882 normalizer underflows exp() to exactly 0 in
fp32, so rank similarities are identically zero and the margin/reg rank losses
are data-independent constants with zero gradient.  We reproduce this for
parity (docs/DEVIATIONS.md); these tests fail loudly if a future change
"fixes" the likelihood scale and silently diverges from the reference's
training dynamics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unit_tpu.models.visual_attention import MetaAttention, VisualAttentionHead


def _mean_head(num_classes=15):
    return VisualAttentionHead(num_classes=num_classes, mode="mean")


def test_mean_likelihood_underflows_to_exact_zero():
    head = _mean_head().bind({})  # likelihood() touches no params in mean mode
    d = 2048
    rng = np.random.RandomState(0)
    n_slots = 16
    attention = MetaAttention(
        mean=jnp.asarray(rng.randn(n_slots, d), jnp.float32),
        cov_inv=jnp.ones((n_slots, d), jnp.float32),
        logdet=jnp.zeros((n_slots,), jnp.float32),
    )
    query = jnp.asarray(rng.randn(8, d), jnp.float32)
    sim = head.likelihood(attention, query, np.arange(n_slots))
    # exp(-1882 - maha/2) == 0.0 exactly in fp32, for ANY query/mean values
    assert sim.shape == (8, n_slots)
    np.testing.assert_array_equal(np.asarray(sim), 0.0)


def test_rank_margin_and_reg_are_the_reference_constants():
    """With similarity identically zero, the margin loss is (S-1)*0.5/S over
    the S selected slots (0.46875 for VOC's 15 base + bg) and the reg loss is
    max(0, 1-0) = 1.0 — the exact constants observed in the reference
    semantics and in our on-chip meta run."""
    num_classes = 15
    base_ids = np.arange(15)
    head = _mean_head(num_classes)
    rng = np.random.RandomState(1)
    pooled = jnp.asarray(rng.randn(4, 14, 14, 1024), jnp.float32)
    gt_classes = jnp.asarray([0, 3, 7, num_classes])  # incl. one background
    valid = jnp.ones((4,), bool)
    d = 2048
    attention = MetaAttention(
        mean=jnp.asarray(rng.randn(num_classes + 1, d), jnp.float32),
        cov_inv=jnp.ones((num_classes + 1, d), jnp.float32),
        logdet=jnp.zeros((num_classes + 1,), jnp.float32),
    )
    variables = head.init(jax.random.PRNGKey(0), pooled, gt_classes, valid,
                          attention, base_ids, method=VisualAttentionHead.rank_loss)
    losses = head.apply(variables, pooled, gt_classes, valid, attention,
                        base_ids, method=VisualAttentionHead.rank_loss)
    n_slots = len(base_ids) + 1  # 16
    expected_margin = (n_slots - 1) * 0.5 / n_slots  # 0.46875
    np.testing.assert_allclose(float(losses["loss_rank_margin"]),
                               expected_margin, rtol=0, atol=1e-7)
    np.testing.assert_allclose(float(losses["loss_rank_reg"]), 1.0,
                               rtol=0, atol=0)
    # the only loss that actually trains in mean mode
    assert float(losses["loss_rank_cls"]) > 0.0
