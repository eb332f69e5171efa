"""Cross-host evaluator merging: merge_from + gather_objects plumbing."""

import pickle

import numpy as np

from unit_tpu.evaluation.coco_eval import COCOEvaluator
from unit_tpu.evaluation.voc_eval import PascalVOCEvaluator
from unit_tpu.parallel.comm import gather_objects


def _voc_feed(ev, image_ids):
    for img in image_ids:
        rng = np.random.RandomState(int(img[1:]))  # per-image, order-free
        ev.process_gt_record({
            "image_id": img,
            "annotations": [
                {"category_id": 0, "bbox": [10, 10, 50, 50]},
                {"category_id": 1, "bbox": [60, 60, 90, 90]},
            ],
        })
        ev.process(
            img,
            np.asarray([[10, 10, 50, 50], [60, 60, 90, 90]], np.float64)
            + rng.rand(2, 4),
            np.asarray([0.9, 0.8]), np.asarray([0, 1]), np.asarray([True, True]),
        )


def test_voc_merge_equals_single_pass():
    full = PascalVOCEvaluator(["a", "b"], use_07_metric=False)
    _voc_feed(full, ["i0", "i1", "i2", "i3"])
    h0 = PascalVOCEvaluator(["a", "b"], use_07_metric=False)
    h1 = PascalVOCEvaluator(["a", "b"], use_07_metric=False)
    _voc_feed(h0, ["i0", "i1"])
    _voc_feed(h1, ["i2", "i3"])
    h0.merge_from(h1)
    assert h0.evaluate() == full.evaluate()


def _coco_feed(ev, image_ids):
    for img in image_ids:
        ev.process_gt_record({
            "image_id": img, "height": 100, "width": 100,
            "annotations": [{"category_id": 0, "bbox": [10, 10, 50, 50]}],
        })
        ev.process(img, np.asarray([[11, 11, 49, 49]]), np.asarray([0.9]),
                   np.asarray([0]), np.asarray([True]))


def test_coco_merge_equals_single_pass():
    full = COCOEvaluator(["a"])
    _coco_feed(full, ["i0", "i1", "i2"])
    h0, h1 = COCOEvaluator(["a"]), COCOEvaluator(["a"])
    _coco_feed(h0, ["i0"])
    _coco_feed(h1, ["i1", "i2"])
    h0.merge_from(h1)
    assert h0.evaluate() == full.evaluate()


def test_evaluators_picklable():
    ev = COCOEvaluator(["a"], iou_type="segm")
    _coco_feed(ev, ["i0"])
    rt = pickle.loads(pickle.dumps(ev))
    assert rt.evaluate() == ev.evaluate()


def test_gather_objects_single_process():
    obj = {"x": np.arange(3)}
    (back,) = gather_objects(obj)
    assert back is obj


def test_inference_on_dataset_keeps_prefed_gt():
    """Regression: the eval driver must not reset() away GT fed by the runner."""
    from unit_tpu.evaluation.evaluator import inference_on_dataset

    class Det:
        def __init__(s, b, sc, c, v):
            s.boxes, s.scores, s.classes, s.valid, s.masks = b, sc, c, v, None

    def predict(imgs, sizes):
        b = imgs.shape[0]
        return Det(np.tile([[10.0, 10, 50, 50]], (b, 1, 1)),
                   np.full((b, 1), 0.9), np.zeros((b, 1), int),
                   np.ones((b, 1), bool))

    batches = [
        {"image": np.zeros((1, 8, 8, 3)), "image_size": np.asarray([[8.0, 8.0]]),
         "image_id": [f"i{k}"], "scale": [1.0], "orig_size": [(100, 100)]}
        for k in range(3)
    ]
    ev = PascalVOCEvaluator(["a"], use_07_metric=False)
    for k in range(3):
        ev.process_gt_record({"image_id": f"i{k}",
                              "annotations": [{"category_id": 0,
                                               "bbox": [10, 10, 50, 50]}]})
    res = inference_on_dataset(predict, iter(batches), ev, total_images=3)
    assert res["bbox"]["AP50"] == 100.0


def test_inference_on_dataset_mask_passthrough():
    """Detections.masks reach a segm evaluator through the eval driver."""
    from unit_tpu.evaluation.coco_eval import COCOEvaluator
    from unit_tpu.evaluation.evaluator import inference_on_dataset

    class Det:
        def __init__(s, b, sc, c, v, m):
            s.boxes, s.scores, s.classes, s.valid, s.masks = b, sc, c, v, m

    def predict(imgs, sizes):
        b = imgs.shape[0]
        return Det(np.tile([[10.0, 10, 50, 50]], (b, 1, 1)),
                   np.full((b, 1), 0.9), np.zeros((b, 1), int),
                   np.ones((b, 1), bool),
                   np.ones((b, 1, 28, 28), np.float32))

    batches = [
        {"image": np.zeros((1, 8, 8, 3)), "image_size": np.asarray([[8.0, 8.0]]),
         "image_id": ["i0"], "scale": [1.0], "orig_size": [(100, 100)]}
    ]
    ev = COCOEvaluator(["a"], iou_type="segm")
    gm = np.zeros((100, 100), bool)
    gm[10:50, 10:50] = True
    ev.process_gt_record({"image_id": "i0", "height": 100, "width": 100,
                          "annotations": [{"category_id": 0,
                                           "bbox": [10, 10, 50, 50],
                                           "mask": gm}]})
    res = inference_on_dataset(predict, iter(batches), ev, total_images=1)
    assert res["segm"]["AP50"] == 100.0
