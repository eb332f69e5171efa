"""inference_on_dataset_meta: the legacy meta eval driver surface.

Reference ``data/utils.py:98-172`` precomputes support attention vectors once
and passes them into every model call.  Two facts pinned here:

1. the driver binds ``att_vecs_support`` as the predict call's leading
   argument and otherwise behaves exactly like ``inference_on_dataset``;
2. the reference parity quirk — at inference the attention is semantically
   dead (the attention-driven visual-similarity branch at
   ``roi_heads.py:386-389`` is commented out; live code derives visual
   similarity from weak-detector posteriors) — so results must be invariant
   to the attention value.
"""

import numpy as np

from unit_tpu.evaluation import (
    PascalVOCEvaluator,
    inference_on_dataset,
    inference_on_dataset_meta,
)


class _Det:
    def __init__(s, b, sc, c, v):
        s.boxes, s.scores, s.classes, s.valid, s.masks = b, sc, c, v, None


def _predict(att, imgs, sizes):
    # attention is threaded through but (matching the reference's inference
    # path) must not influence the detections
    assert att is not None and "proto" in att
    b = imgs.shape[0]
    return _Det(
        np.tile([[10.0, 10, 50, 50]], (b, 1, 1)),
        np.full((b, 1), 0.9),
        np.zeros((b, 1), int),
        np.ones((b, 1), bool),
    )


def _batches():
    return [
        {"image": np.zeros((1, 8, 8, 3)), "image_size": np.asarray([[8.0, 8.0]]),
         "image_id": [f"i{k}"], "scale": [1.0], "orig_size": [(100, 100)]}
        for k in range(3)
    ]


def _evaluator():
    ev = PascalVOCEvaluator(["a"], use_07_metric=False)
    for k in range(3):
        ev.process_gt_record({"image_id": f"i{k}",
                              "annotations": [{"category_id": 0,
                                               "bbox": [10, 10, 50, 50]}]})
    return ev


def test_meta_driver_binds_attention_and_scores():
    att = {"proto": np.ones((3, 4), np.float32)}
    res = inference_on_dataset_meta(
        _predict, iter(_batches()), att, _evaluator(), total_images=3
    )
    assert res["bbox"]["AP50"] == 100.0


def test_meta_driver_matches_plain_driver_and_is_attention_invariant():
    r_meta1 = inference_on_dataset_meta(
        _predict, iter(_batches()), {"proto": np.zeros((3, 4))}, _evaluator(),
        total_images=3,
    )
    r_meta2 = inference_on_dataset_meta(
        _predict, iter(_batches()), {"proto": 99 + np.ones((5, 2))}, _evaluator(),
        total_images=3,
    )
    r_plain = inference_on_dataset(
        lambda im, sz: _predict({"proto": 0}, im, sz),
        iter(_batches()), _evaluator(), total_images=3,
    )
    for key in ("AP", "AP50", "AP75"):
        assert r_meta1["bbox"][key] == r_meta2["bbox"][key] == r_plain["bbox"][key]
