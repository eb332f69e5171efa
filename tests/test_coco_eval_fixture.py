"""The frozen COCOeval fixture replays to its recorded 12 stats.

tests/fixtures/coco_eval_fixture.json is the exportable validation artifact
(round-2 verdict item 7): GT + detections in standard COCO json format plus
the 12 stats unit_tpu's evaluator computed for them.  This test locks the
implementation to the frozen numbers; scripts/verify_coco_eval_pycocotools.py
replays the same fixture through pycocotools wherever it exists.
"""

import json
import os

import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "coco_eval_fixture.json"
)


def test_fixture_replays_exactly():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from export_coco_eval_fixture import run_unit_tpu_eval

    fx = json.load(open(FIXTURE))
    stats = run_unit_tpu_eval(fx["gt"], fx["detections"])
    np.testing.assert_allclose(stats, fx["expected_stats"], atol=1e-9)


def test_fixture_is_wellformed_coco_json():
    fx = json.load(open(FIXTURE))
    gt = fx["gt"]
    assert {"images", "annotations", "categories"} <= set(gt)
    img_ids = {im["id"] for im in gt["images"]}
    cat_ids = {c["id"] for c in gt["categories"]}
    for ann in gt["annotations"]:
        assert ann["image_id"] in img_ids and ann["category_id"] in cat_ids
        assert len(ann["bbox"]) == 4 and ann["bbox"][2] > 0 and ann["bbox"][3] > 0
        assert "iscrowd" in ann and "area" in ann and "id" in ann
    for det in fx["detections"]:
        assert det["image_id"] in img_ids and det["category_id"] in cat_ids
    assert len(fx["expected_stats"]) == 12
    # the fixture must exercise crowds, ties, and an empty image
    assert any(a["iscrowd"] for a in gt["annotations"])
    imgs_with_gt = {a["image_id"] for a in gt["annotations"]}
    assert img_ids - imgs_with_gt, "fixture should include an image with no GT"
