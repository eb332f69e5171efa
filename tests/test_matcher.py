import numpy as np
import jax.numpy as jnp

from unit_tpu.ops import matcher as M


def _np_match(quality, thresholds, labels, allow_low_quality):
    """Direct NumPy port of the reference matcher semantics
    (/root/reference/modeling/matcher.py:54-119)."""
    if quality.shape[0] == 0:
        n = quality.shape[1]
        return np.zeros(n, np.int64), np.full(n, labels[0]), np.zeros(n)
    vals = quality.max(0)
    matches = quality.argmax(0)
    out = np.ones(len(vals), np.int64)
    th = [-np.inf] + list(thresholds) + [np.inf]
    for l, lo, hi in zip(labels, th[:-1], th[1:]):
        out[(vals >= lo) & (vals < hi)] = l
    if allow_low_quality:
        best_per_gt = quality.max(1)
        ii, jj = np.nonzero(quality == best_per_gt[:, None])
        out[jj] = 1
    return matches, out, vals


def test_matcher_roi_thresholds(rng):
    q = rng.rand(4, 30).astype(np.float32)
    want = _np_match(q, [0.5], [0, 1], False)
    got = M.match(jnp.asarray(q), jnp.ones(4, bool), [0.5], [0, 1], False)
    np.testing.assert_array_equal(np.asarray(got.matches), want[0])
    np.testing.assert_array_equal(np.asarray(got.labels), want[1])
    np.testing.assert_allclose(np.asarray(got.vals), want[2], atol=1e-6)


def test_matcher_rpn_low_quality(rng):
    q = rng.rand(3, 50).astype(np.float32) * 0.6  # mostly below fg threshold
    want = _np_match(q, [0.3, 0.7], [0, -1, 1], True)
    got = M.match(jnp.asarray(q), jnp.ones(3, bool), [0.3, 0.7], [0, -1, 1], True)
    np.testing.assert_array_equal(np.asarray(got.matches), want[0])
    np.testing.assert_array_equal(np.asarray(got.labels), want[1])


def test_matcher_empty_gt(rng):
    q = rng.rand(4, 10).astype(np.float32)
    got = M.match(jnp.asarray(q), jnp.zeros(4, bool), [0.5], [0, 1], False)
    np.testing.assert_array_equal(np.asarray(got.labels), np.zeros(10))
    np.testing.assert_allclose(np.asarray(got.vals), np.zeros(10))


def test_matcher_padded_gt_ignored(rng):
    q = rng.rand(4, 20).astype(np.float32)
    valid = np.array([True, True, False, False])
    want = _np_match(q[:2], [0.5], [0, 1], False)
    got = M.match(jnp.asarray(q), jnp.asarray(valid), [0.5], [0, 1], False)
    np.testing.assert_array_equal(np.asarray(got.matches), want[0])
    np.testing.assert_array_equal(np.asarray(got.labels), want[1])
    np.testing.assert_allclose(np.asarray(got.vals), want[2], atol=1e-6)
