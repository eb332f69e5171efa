"""Support (meta) stream loader: shapes, determinism, per-class boxes."""

import numpy as np

from unit_tpu.data.loader import SupportLoader


def _records():
    by_class = {}
    for c in [0, 1, 3]:
        by_class[c] = [
            {
                "image_id": f"c{c}_{i}",
                "height": 80,
                "width": 120,
                "annotations": [
                    {"category_id": c, "bbox": [10.0, 10.0, 60.0, 50.0]},
                    {"category_id": 99, "bbox": [0.0, 0.0, 5.0, 5.0]},
                ],
            }
            for i in range(4)
        ]
    return by_class


def _img_loader(rec):
    return np.full((rec["height"], rec["width"], 3), 7.0, np.float32)


def test_support_batch_shapes():
    loader = SupportLoader(_records(), [0, 1, 3], shots=2, meta_size=32,
                           image_loader=_img_loader)
    batch = loader.next_batch()
    assert batch["image"].shape == (3, 2, 32, 32, 3)
    assert batch["boxes"].shape == (3, 2, 4)
    assert batch["class_valid"].all()
    # box rescaled into the square meta frame: x scaled by 32/120, y by 32/80
    b = batch["boxes"][0, 0]
    np.testing.assert_allclose(b, [10 * 32 / 120, 10 * 32 / 80, 60 * 32 / 120,
                                   50 * 32 / 80], atol=1e-4)


def test_support_missing_class_marked_invalid():
    loader = SupportLoader(_records(), [0, 7], shots=1, meta_size=16,
                           image_loader=_img_loader)
    batch = loader.next_batch()
    assert batch["class_valid"][0] and not batch["class_valid"][1]


def test_support_deterministic_mode_cycles():
    loader = SupportLoader(_records(), [0], shots=2, meta_size=16,
                           deterministic=True, image_loader=_img_loader)
    # deterministic chunked sampling walks the pool in order (common.py:43-56)
    ids_seen = []
    for _ in range(2):
        loader.next_batch()
        ids_seen.append(loader._det_pos[0])
    assert ids_seen == [2, 0]  # 4-shot pool, 2 per batch -> wraps after 2 batches
