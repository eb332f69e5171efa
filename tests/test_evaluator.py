import numpy as np

from unit_tpu.evaluation import PascalVOCEvaluator, voc_ap


def _record(image_id, anns):
    return {"image_id": image_id, "annotations": anns}


def test_perfect_detections_score_100():
    ev = PascalVOCEvaluator(["a", "b"], novel_class_ids=[1], use_07_metric=False)
    gt = [
        _record("img1", [
            {"category_id": 0, "bbox": [10, 10, 50, 50]},
            {"category_id": 1, "bbox": [60, 60, 90, 90]},
        ]),
        _record("img2", [{"category_id": 0, "bbox": [0, 0, 30, 30]}]),
    ]
    for r in gt:
        ev.process_gt_record(r)
    ev.process("img1", np.asarray([[10, 10, 50, 50], [60, 60, 90, 90]]),
               np.asarray([0.9, 0.8]), np.asarray([0, 1]), np.asarray([True, True]))
    ev.process("img2", np.asarray([[0, 0, 30, 30]]), np.asarray([0.95]),
               np.asarray([0]), np.asarray([True]))
    res = ev.evaluate()["bbox"]
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["novel_mean"] - 100.0) < 1e-6


def test_false_positive_lowers_precision():
    ev = PascalVOCEvaluator(["a"], use_07_metric=False)
    ev.process_gt_record(_record("img1", [{"category_id": 0, "bbox": [10, 10, 50, 50]}]))
    # one perfect detection + one high-scoring false positive
    ev.process("img1", np.asarray([[200, 200, 240, 240], [10, 10, 50, 50]]),
               np.asarray([0.9, 0.8]), np.asarray([0, 0]), np.asarray([True, True]))
    res = ev.evaluate()["bbox"]
    # recall reaches 1.0 at precision 0.5 -> AP ~= 50 (area metric)
    assert abs(res["AP50"] - 50.0) < 1.0


def test_duplicate_detection_counts_as_fp():
    ev = PascalVOCEvaluator(["a"], use_07_metric=False)
    ev.process_gt_record(_record("img1", [{"category_id": 0, "bbox": [10, 10, 50, 50]}]))
    ev.process("img1", np.asarray([[10, 10, 50, 50], [11, 11, 50, 50]]),
               np.asarray([0.9, 0.8]), np.asarray([0, 0]), np.asarray([True, True]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 100.0  # second is fp but after full recall


def test_difficult_gt_ignored():
    ev = PascalVOCEvaluator(["a"], use_07_metric=False)
    ev.process_gt_record(
        _record("img1", [
            {"category_id": 0, "bbox": [10, 10, 50, 50], "difficult": 1},
            {"category_id": 0, "bbox": [60, 60, 90, 90], "difficult": 0},
        ])
    )
    # detect only the difficult one -> no tp, no fp; then the easy one
    ev.process("img1", np.asarray([[10, 10, 50, 50], [60, 60, 90, 90]]),
               np.asarray([0.9, 0.8]), np.asarray([0, 0]), np.asarray([True, True]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 100.0


def test_voc_ap_07_metric():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 0.5])
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    # 11-point: t<=0.5 -> 1.0 (6 points), t>0.5 -> 0.5 (5 points)
    assert abs(ap07 - (6 * 1.0 + 5 * 0.5) / 11.0) < 1e-6


def test_low_iou_is_fp():
    ev = PascalVOCEvaluator(["a"], use_07_metric=False)
    ev.process_gt_record(_record("img1", [{"category_id": 0, "bbox": [10, 10, 50, 50]}]))
    ev.process("img1", np.asarray([[30, 30, 70, 70]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 0.0
