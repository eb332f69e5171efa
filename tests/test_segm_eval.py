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


def test_rasterize_polygons_rectangle_exact():
    from unit_tpu.data.coco import rasterize_polygons

    # axis-aligned rectangle [10, 20] x [5, 15] -> exactly pixels 10..19 x 5..14
    poly = [[10.0, 5.0, 20.0, 5.0, 20.0, 15.0, 10.0, 15.0]]
    m = rasterize_polygons(poly, 30, 40)
    expect = np.zeros((30, 40), bool)
    expect[5:15, 10:20] = True
    np.testing.assert_array_equal(m, expect)


def test_rasterize_polygons_triangle_half_area():
    from unit_tpu.data.coco import rasterize_polygons

    poly = [[0.0, 0.0, 100.0, 0.0, 0.0, 100.0]]
    m = rasterize_polygons(poly, 100, 100)
    assert abs(m.sum() / 5000.0 - 1.0) < 0.02  # ~half the square


def test_rasterize_polygons_union_of_parts():
    from unit_tpu.data.coco import rasterize_polygons

    # two disjoint rectangles of one instance -> union
    polys = [
        [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0],
        [20.0, 0.0, 30.0, 0.0, 30.0, 10.0, 20.0, 10.0],
    ]
    m = rasterize_polygons(polys, 20, 40)
    assert m[:10, :10].all() and m[:10, 20:30].all()
    assert not m[:, 10:20].any()


def test_segm_eval_polygon_gt_is_pixel_exact():
    """Polygon GT must beat the 28x28 box_mask upsample on a thin diagonal."""
    from unit_tpu.data.coco import polygons_to_boxmask, rasterize_polygons

    # thin diagonal sliver: polygon GT keeps it sharp at 200x200
    poly = [[0.0, 0.0, 200.0, 180.0, 200.0, 200.0, 0.0, 20.0]]
    ev = COCOEvaluator(["a"], iou_type="segm")
    ev.process_gt_record({
        "image_id": "i1", "height": 200, "width": 200,
        "annotations": [{
            "category_id": 0, "bbox": [0, 0, 200, 200],
            "segmentation": poly,
            # decoy box_mask: if the evaluator preferred it, IoU would differ
            "box_mask": np.ones((28, 28), bool),
        }],
    })
    # predict exactly the polygon rasterization, downsampled to the 28x28
    # mask-head frame; IoU vs the pixel-exact GT stays > 0.75
    exact = rasterize_polygons(poly, 200, 200)
    pred = polygons_to_boxmask(poly, [0, 0, 200, 200], 28).astype(np.float32)
    ev.process("i1", np.asarray([[0, 0, 200, 200]]), np.asarray([0.9]),
               np.asarray([0]), np.asarray([True]), masks=[pred])
    res = ev.evaluate()["segm"]
    assert res["AP75"] == 100.0
    # sanity: the sliver covers ~10% of the image, not the full decoy box_mask
    assert 0.05 < exact.mean() < 0.15
