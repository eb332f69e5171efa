import numpy as np
import jax.numpy as jnp

from unit_tpu.ops import nms as N
from tests.test_boxes import random_boxes


def _np_greedy_nms(boxes, scores, thr):
    """Reference greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[pos + 1 :]:
            if suppressed[j]:
                continue
            xa, ya = np.maximum(boxes[i, :2], boxes[j, :2])
            xb, yb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            inter = max(xb - xa, 0) * max(yb - ya, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            u = ai + aj - inter
            if u > 0 and inter / u > thr:
                suppressed[j] = True
    return keep


def test_nms_matches_greedy_reference(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 200, size=60.0)  # dense -> many overlaps
        scores = rng.rand(200).astype(np.float32)
        want = _np_greedy_nms(boxes, scores, 0.5)
        idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 200, tile_size=64)
        got = list(np.asarray(idx)[np.asarray(valid)])
        assert got == want, f"trial {trial}: {got[:10]} vs {want[:10]}"


def test_nms_max_out_truncates(rng):
    boxes = random_boxes(rng, 100, size=1000.0)  # sparse -> few suppressions
    scores = rng.rand(100).astype(np.float32)
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 10)
    assert idx.shape == (10,)
    got_scores = scores[np.asarray(idx)]
    assert np.all(np.diff(got_scores) <= 1e-6)  # sorted descending


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.rand(50).astype(np.float32)
    valid = np.arange(50) < 20
    idx, ok = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 50, valid=jnp.asarray(valid))
    kept = np.asarray(idx)[np.asarray(ok)]
    assert np.all(kept < 20)


def test_batched_nms_classes_dont_interact(rng):
    # identical boxes in different classes must all survive
    box = np.asarray([[10, 10, 20, 20]] * 4, np.float32)
    scores = np.asarray([0.9, 0.8, 0.7, 0.6], np.float32)
    idxs = np.asarray([0, 1, 2, 3])
    _, ok = N.batched_nms(jnp.asarray(box), jnp.asarray(scores), jnp.asarray(idxs), 0.5, 4)
    assert int(np.asarray(ok).sum()) == 4
    # same class: one survives
    idxs2 = np.zeros(4, np.int32)
    _, ok2 = N.batched_nms(jnp.asarray(box), jnp.asarray(scores), jnp.asarray(idxs2), 0.5, 4)
    assert int(np.asarray(ok2).sum()) == 1
