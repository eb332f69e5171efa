"""Host-synchronized aspect-ratio bucketing (multi-host SPMD safety).

Without synchronization, aspect-ratio-grouped StreamLoaders on different
processes emit different-shaped batches in the same step; shard_batch then
assembles mismatched global arrays, each host compiles a different program,
and the cross-host collectives deadlock.  With ``sync_portrait_frac`` every
host draws the batch orientation from the same seeded schedule.
"""

import numpy as np
import pytest

from unit_tpu.data.loader import StreamLoader, _STRONG_KEYS
from unit_tpu.data.transforms import TransformConfig, oriented_canvas


def _records(n, seed=0):
    rng = np.random.RandomState(seed)
    recs = []
    for i in range(n):
        portrait = bool(rng.rand() < 0.4)
        h, w = (120, 90) if portrait else (90, 120)
        recs.append({
            "image_id": f"im{i}", "file_name": f"/nonexistent/im{i}.png",
            "height": h, "width": w,
            "annotations": [{"bbox": [5.0, 5.0, 40.0, 40.0], "category_id": 1}],
        })
    return recs


def _fake_loader(rec):
    rng = np.random.RandomState(abs(hash(rec["image_id"])) % 2**31)
    return rng.rand(rec["height"], rec["width"], 3).astype(np.float32) * 255


def _tcfg():
    return TransformConfig(min_sizes=(64,), max_size=96, canvas=(64, 96),
                           flip=True, max_gt=5, num_classes=20)


def _shapes(loader, n):
    it = iter(loader)
    return [next(it)["image"].shape for _ in range(n)]


def test_synced_hosts_emit_identical_batch_shapes():
    full = _records(40)
    frac = sum(r["height"] > r["width"] for r in full) / len(full)
    shards = [full[0::2], full[1::2]]
    seqs = []
    for shard in shards:
        loader = StreamLoader(shard, _tcfg(), batch_size=2, keys=_STRONG_KEYS,
                              seed=3, image_loader=_fake_loader,
                              sync_portrait_frac=frac)
        seqs.append(_shapes(loader, 12))
    assert seqs[0] == seqs[1]
    # both orientations actually occur (the schedule is not degenerate)
    assert len({s[1:3] for s in seqs[0]}) == 2


def test_synced_batches_are_orientation_pure():
    full = _records(30, seed=1)
    frac = sum(r["height"] > r["width"] for r in full) / len(full)
    loader = StreamLoader(full, _tcfg(), batch_size=3, keys=_STRONG_KEYS,
                          seed=5, image_loader=_fake_loader,
                          sync_portrait_frac=frac)
    for batch in _shapes(loader, 8):
        # a batch canvas is one of the two oriented canvases, never mixed
        assert batch[1:3] in {(64, 96), (96, 64)}


def test_synced_missing_orientation_raises():
    # shard is landscape-only but the global fraction schedules portraits
    shard = [r for r in _records(40) if r["height"] <= r["width"]]
    loader = StreamLoader(shard, _tcfg(), batch_size=2, keys=_STRONG_KEYS,
                          seed=3, image_loader=_fake_loader,
                          sync_portrait_frac=0.5)
    with pytest.raises(RuntimeError, match="portrait"):
        _shapes(loader, 20)


def test_square_canvas_skips_sync():
    tcfg = TransformConfig(min_sizes=(64,), max_size=96, canvas=(96, 96),
                           flip=True, max_gt=5, num_classes=20)
    loader = StreamLoader(_records(12), tcfg, batch_size=2, keys=_STRONG_KEYS,
                          seed=3, image_loader=_fake_loader,
                          sync_portrait_frac=0.4)
    for shape in _shapes(loader, 4):
        assert shape[1:3] == (96, 96)
