"""StreamLoader/SupportLoader.fast_forward: exact --resume of data streams.

A resumed run must see exactly the batches an uninterrupted run would have
seen from ``start_step`` on, without decoding the skipped images (the
reference's d2-style infinite sampler replays the stream from the beginning
on resume, /root/reference/data/build.py).
"""

import numpy as np

from unit_tpu.data import StreamLoader, TransformConfig
from unit_tpu.data.loader import SupportLoader

_KEYS = ("image", "image_size", "gt_boxes", "gt_classes", "gt_valid")


def _fake_image_loader(rec):
    rng = np.random.RandomState(abs(hash(rec["image_id"])) % 2**31)
    return (rng.rand(rec["height"], rec["width"], 3) * 255).astype(np.float32)


def _records(n=11):
    recs = []
    for i in range(n):
        portrait = i % 3 == 0
        h, w = (130, 100) if portrait else (100, 140)
        recs.append({
            "image_id": f"im{i}",
            "file_name": f"/nonexistent/im{i}.png",
            "height": h,
            "width": w,
            "annotations": [
                {"bbox": [10.0 + i, 12.0, 60.0 + i, 50.0], "category_id": i % 5}
            ],
        })
    return recs


def _mk(seed=3, sync=None, bs=2):
    t = TransformConfig(min_sizes=(64, 96), max_size=128, canvas=(96, 128),
                        flip=True, max_gt=5)
    return StreamLoader(_records(), t, bs, _KEYS, seed=seed, training=True,
                        image_loader=_fake_image_loader,
                        sync_portrait_frac=sync)


def _take(it, n):
    return [next(it) for _ in range(n)]


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert set(x) == set(y)
        for k in x:
            np.testing.assert_array_equal(np.asarray(x[k]), np.asarray(y[k]), err_msg=k)


def test_fast_forward_matches_plain_stream():
    ref = _take(iter(_mk()), 9)
    for skip in (1, 4, 7):  # crosses epoch boundaries of the 11-record set
        ld = _mk()
        ld.fast_forward(skip)
        _assert_batches_equal(_take(iter(ld), 9 - skip), ref[skip:])


def test_fast_forward_zero_is_noop():
    ld = _mk()
    ld.fast_forward(0)
    _assert_batches_equal(_take(iter(ld), 3), _take(iter(_mk()), 3))


def test_fast_forward_synced_schedule():
    ref = _take(iter(_mk(sync=0.4)), 8)
    for skip in (2, 5):
        ld = _mk(sync=0.4)
        ld.fast_forward(skip)
        _assert_batches_equal(_take(iter(ld), 8 - skip), ref[skip:])


def test_fast_forward_synced_square_canvas_delegates():
    def mk():
        t = TransformConfig(min_sizes=(64,), max_size=96, canvas=(96, 96),
                            flip=True, max_gt=5)
        return StreamLoader(_records(), t, 2, _KEYS, seed=5, training=True,
                            image_loader=_fake_image_loader,
                            sync_portrait_frac=0.3)

    ref = _take(iter(mk()), 6)
    ld = mk()
    ld.fast_forward(2)
    _assert_batches_equal(_take(iter(ld), 4), ref[2:])


def test_support_loader_fast_forward():
    by_class = {
        c: [
            {"image_id": f"c{c}_{i}", "file_name": f"/nonexistent/c{c}_{i}.png",
             "height": 64, "width": 80,
             "annotations": [{"bbox": [4.0, 4.0, 40.0, 30.0], "category_id": c}]}
            for i in range(3 + c)
        ]
        for c in (0, 1, 2)
    }

    def mk():
        return SupportLoader(by_class, class_ids=[0, 1, 2, 3], shots=2,
                             meta_size=32, seed=9,
                             image_loader=_fake_image_loader)

    ref = [mk_batch for mk_batch in _take(iter(mk()), 7)]
    ld = mk()
    ld.fast_forward(4)
    _assert_batches_equal(_take(iter(ld), 3), ref[4:])
