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


def test_capped_survivor_buffer_matches_full(rng):
    """Round-5 NMS fast path: the max_keep survivor-buffer algorithm must
    return the EXACT same consumed prefix (first max_out kept boxes, in
    order) as the full tiled greedy algorithm, across cluster densities
    that exercise long suppression chains and early buffer fill."""
    for n, max_out, thr, spread in [
        (2048, 256, 0.5, 400.0),   # dense clusters, chains
        (1600, 128, 0.7, 150.0),   # very dense, buffer fills early
        (1200, 600, 0.5, 2000.0),  # sparse, buffer never fills
        (700, 700, 0.5, 300.0),    # max_keep >= n: full path
    ]:
        centers = rng.rand(n, 2) * spread
        wh = 20 + rng.rand(n, 2) * 60
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(
            np.float32
        )
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.05
        s = np.where(valid, scores, -1e30)
        order = np.argsort(-s)
        sv = s[order] > -1e29
        sb = jnp.asarray(np.where(sv[:, None], boxes[order], 0.0))
        keep_full = np.asarray(N.nms_sorted_mask(sb, thr, 512)) & sv
        want = order[np.flatnonzero(keep_full)[:max_out]]

        idx, ok = N.nms(
            jnp.asarray(boxes), jnp.asarray(scores), thr, max_out,
            valid=jnp.asarray(valid),
        )
        got = np.asarray(idx)[np.asarray(ok)]
        assert np.array_equal(got, want), (n, max_out, thr)
