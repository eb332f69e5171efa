import numpy as np

from unit_tpu.evaluation.coco_eval import COCOEvaluator
from unit_tpu.data.coco import polygons_to_boxmask, load_coco_json


def _record(image_id, anns):
    return {"image_id": image_id, "annotations": anns}


def test_perfect_coco_detections():
    ev = COCOEvaluator(["a", "b"], novel_class_ids=[1])
    ev.process_gt_record(_record("i1", [
        {"category_id": 0, "bbox": [10, 10, 50, 50]},
        {"category_id": 1, "bbox": [60, 60, 120, 120]},
    ]))
    ev.process("i1", np.asarray([[10, 10, 50, 50], [60, 60, 120, 120]]),
               np.asarray([0.9, 0.8]), np.asarray([0, 1]), np.asarray([True, True]))
    res = ev.evaluate()["bbox"]
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["novel_mean"] - 100.0) < 1e-6


def test_half_iou_scores_partial():
    ev = COCOEvaluator(["a"])
    ev.process_gt_record(_record("i1", [{"category_id": 0, "bbox": [0, 0, 100, 100]}]))
    # IoU = 0.8: counts at thresholds 0.50..0.80 (7/10), misses 0.85+
    ev.process("i1", np.asarray([[0, 0, 100, 80]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 100.0
    assert res["AP75"] == 100.0
    assert abs(res["AP"] - 70.0) < 1e-6


def test_crowd_gt_not_required():
    ev = COCOEvaluator(["a"])
    ev.process_gt_record(_record("i1", [
        {"category_id": 0, "bbox": [0, 0, 50, 50]},
        {"category_id": 0, "bbox": [60, 0, 120, 50], "iscrowd": 1},
    ]))
    ev.process("i1", np.asarray([[0, 0, 50, 50]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]))
    res = ev.evaluate()["bbox"]
    assert res["AP"] == 100.0  # crowd GT doesn't count as a miss


def test_area_slicing():
    ev = COCOEvaluator(["a"])
    ev.process_gt_record(_record("i1", [{"category_id": 0, "bbox": [0, 0, 20, 20]}]))  # small
    ev.process("i1", np.asarray([[0, 0, 20, 20]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]))
    res = ev.evaluate()["bbox"]
    assert res["APs"] == 100.0
    assert res["APl"] == -1.0  # no large GT


def test_polygon_rasterization():
    # square polygon covering the right half of its box
    box = [0.0, 0.0, 10.0, 10.0]
    poly = [5.0, 0.0, 10.0, 0.0, 10.0, 10.0, 5.0, 10.0]
    m = polygons_to_boxmask([poly], box, size=16)
    assert m[:, 8:].mean() > 0.9
    assert m[:, :8].mean() < 0.1


def test_load_coco_json(tmp_path):
    data = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 100}],
        "categories": [{"id": 7, "name": "x"}, {"id": 9, "name": "y"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 30],
             "area": 600, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 9, "bbox": [0, 0, 5, 5],
             "area": 25, "iscrowd": 0},
        ],
    }
    p = tmp_path / "instances.json"
    import json

    p.write_text(json.dumps(data))
    recs = load_coco_json(str(p), str(tmp_path))
    assert len(recs) == 1
    anns = recs[0]["annotations"]
    assert anns[0]["category_id"] == 0 and anns[0]["bbox"] == [10, 10, 30, 40]
    assert anns[1]["category_id"] == 1
    recs_f = load_coco_json(str(p), str(tmp_path), class_ids_to_include=[0])
    assert len(recs_f[0]["annotations"]) == 1
