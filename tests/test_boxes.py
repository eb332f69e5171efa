import numpy as np
import jax.numpy as jnp

from unit_tpu.structures import boxes as B


def _np_iou(b1, b2):
    m, n = len(b1), len(b2)
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            xa = max(b1[i, 0], b2[j, 0])
            ya = max(b1[i, 1], b2[j, 1])
            xb = min(b1[i, 2], b2[j, 2])
            yb = min(b1[i, 3], b2[j, 3])
            inter = max(xb - xa, 0) * max(yb - ya, 0)
            a1 = max(b1[i, 2] - b1[i, 0], 0) * max(b1[i, 3] - b1[i, 1], 0)
            a2 = max(b2[j, 2] - b2[j, 0], 0) * max(b2[j, 3] - b2[j, 1], 0)
            u = a1 + a2 - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_numpy(rng):
    b1 = random_boxes(rng, 7)
    b2 = random_boxes(rng, 5)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = _np_iou(b1, b2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_degenerate_box_is_zero():
    b1 = jnp.asarray([[10.0, 10.0, 10.0, 20.0]])  # zero width
    b2 = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])
    assert float(B.pairwise_iou(b1, b2)[0, 0]) == 0.0


def test_deltas_roundtrip(rng):
    src = random_boxes(rng, 16)
    tgt = random_boxes(rng, 16)
    w = (10.0, 10.0, 5.0, 5.0)
    d = B.get_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
    rec = B.apply_deltas(d, jnp.asarray(src), w)
    np.testing.assert_allclose(np.asarray(rec), tgt, atol=5e-3)


def test_apply_deltas_multiclass_shape(rng):
    src = jnp.asarray(random_boxes(rng, 8))
    deltas = jnp.asarray(rng.randn(8, 5 * 4).astype(np.float32) * 0.1)
    out = B.apply_deltas(deltas, src)
    assert out.shape == (8, 20)
    # class 0 slice equals single-class application
    out0 = B.apply_deltas(deltas[:, :4], src)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(out0), atol=1e-5)


def test_clip_and_nonempty():
    b = jnp.asarray([[-5.0, -5.0, 500.0, 30.0], [3.0, 3.0, 3.0, 9.0]])
    c = B.clip_boxes(b, (40, 60))
    np.testing.assert_allclose(np.asarray(c[0]), [0, 0, 60, 30])
    mask = B.nonempty(c)
    assert bool(mask[0]) and not bool(mask[1])
