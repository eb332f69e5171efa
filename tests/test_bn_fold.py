"""fold_frozen_bn: eval-time Conv+FrozenBN folding preserves the forward pass.

The fold (unit_tpu/utils/bn_fold.py) rewrites `conv -> x*s+t` pairs as
`conv(x, W*s) -> x+t` in the parameter pytree only; the module graph is
unchanged.  These tests randomize the BN statistics (init values are the
identity, which would fold trivially) and bound the float drift of the
reordered arithmetic on the backbone and on the full predict path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unit_tpu.models import ResNetC4
from unit_tpu.utils.bn_fold import fold_frozen_bn

from test_model_smoke import tiny_config  # noqa: F401  (shared tiny ModelConfig)
from unit_tpu.models import WSRCNN


def _randomize_bn(params, seed=0):
    """Give every FrozenBN non-trivial weight/bias/mean/var (init is identity)."""
    rng = np.random.RandomState(seed)

    def walk(tree, path=()):
        if not isinstance(tree, dict):
            return tree
        if {"weight", "bias", "mean", "var"} <= set(tree) and path[-1].endswith("_bn"):
            shape = np.shape(tree["weight"])
            return dict(
                tree,
                weight=jnp.asarray(0.5 + rng.rand(*shape), jnp.float32),
                bias=jnp.asarray(rng.randn(*shape) * 0.1, jnp.float32),
                mean=jnp.asarray(rng.randn(*shape) * 0.2, jnp.float32),
                var=jnp.asarray(0.5 + rng.rand(*shape), jnp.float32),
            )
        return {k: walk(v, path + (k,)) for k, v in tree.items()}

    return walk(params)


def test_fold_structure_and_identity():
    model = ResNetC4(depth=26)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params = _randomize_bn(params)
    folded = fold_frozen_bn(params)
    # identical tree structure and shapes
    assert jax.tree_util.tree_structure(folded) == jax.tree_util.tree_structure(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(folded),
    ):
        assert a.shape == b.shape, pa
    # every folded BN is the identity-scale / shift form
    bn = folded["stem_conv1_bn"]
    np.testing.assert_array_equal(np.asarray(bn["weight"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)
    # and the conv kernel actually changed (non-trivial fold)
    assert not np.allclose(
        np.asarray(folded["stem_conv1"]["kernel"]),
        np.asarray(params["stem_conv1"]["kernel"]),
    )


def test_backbone_forward_equality_fp32():
    model = ResNetC4(depth=26, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    params = _randomize_bn(model.init(jax.random.PRNGKey(0), x)["params"])
    y0 = model.apply({"params": params}, x)
    y1 = model.apply({"params": fold_frozen_bn(params)}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-4, atol=2e-5)


def test_fold_is_idempotent():
    model = ResNetC4(depth=26)
    params = _randomize_bn(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    )
    once = fold_frozen_bn(params)
    twice = fold_frozen_bn(once)
    for a, b in zip(jax.tree_util.tree_leaves(once), jax.tree_util.tree_leaves(twice)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_predict_raw_equality_tiny_model():
    # Compare the pre-NMS seam (predict_raw) on FIXED proposal boxes: an
    # untrained model's RPN objectness sits at top-k/NMS decision boundaries,
    # so bf16-level drift legitimately reorders proposal selection — fixing
    # the proposals isolates the fold's numeric effect on the heads.
    mc = tiny_config()
    model = WSRCNN(mc=mc)
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32)
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    params = _randomize_bn(variables["params"], seed=3)

    pboxes = np.zeros((1, 16, 4), np.float32)
    pboxes[..., :2] = rng.rand(1, 16, 2) * 30
    pboxes[..., 2:] = pboxes[..., :2] + 8 + rng.rand(1, 16, 2) * 24
    pboxes = jnp.asarray(pboxes)
    pvalid = jnp.ones((1, 16), bool)

    probs0, bbox0, _, _ = model.apply(
        {"params": params}, imgs, sizes,
        proposal_boxes=pboxes, proposal_valid=pvalid, method=WSRCNN.predict_raw,
    )
    probs1, bbox1, _, _ = model.apply(
        {"params": fold_frozen_bn(params)}, imgs, sizes,
        proposal_boxes=pboxes, proposal_valid=pvalid, method=WSRCNN.predict_raw,
    )
    np.testing.assert_allclose(
        np.asarray(probs0), np.asarray(probs1), rtol=1e-2, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(bbox0), np.asarray(bbox1), rtol=1e-2, atol=2e-2
    )
