"""COCO segmentation (mask IoU) evaluation end-to-end on synthetic masks."""

import numpy as np

from unit_tpu.evaluation.coco_eval import COCOEvaluator


def test_segm_eval_perfect_mask():
    ev = COCOEvaluator(["a"], iou_type="segm")
    gm = np.zeros((100, 100), bool)
    gm[20:60, 30:70] = True
    ev.process_gt_record({
        "image_id": "i1",
        "annotations": [{"category_id": 0, "bbox": [30, 20, 70, 60], "mask": gm}],
    })
    # predicted mask = all ones inside the predicted box == GT box
    pred_mask = np.ones((28, 28), np.float32)
    ev.process("i1", np.asarray([[30, 20, 70, 60]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]), masks=[pred_mask])
    res = ev.evaluate()["segm"]
    assert res["AP50"] == 100.0


def test_segm_eval_wrong_mask_fails_high_iou():
    ev = COCOEvaluator(["a"], iou_type="segm")
    gm = np.zeros((100, 100), bool)
    gm[20:60, 30:70] = True
    ev.process_gt_record({
        "image_id": "i1",
        "annotations": [{"category_id": 0, "bbox": [30, 20, 70, 60], "mask": gm}],
    })
    # predicted mask covers only the left half of the box -> IoU 0.5
    pred = np.zeros((28, 28), np.float32)
    pred[:, :14] = 1.0
    ev.process("i1", np.asarray([[30, 20, 70, 60]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]), masks=[pred])
    res = ev.evaluate()["segm"]
    assert res["AP50"] == 100.0   # IoU ~0.5 passes the 0.5 threshold
    assert res["AP75"] == 0.0     # but not 0.75
