"""shapes-COCO generator: COCO-JSON protocol + pixel-exact polygon masks."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_shapes_coco(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapes_coco"))
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "make_shapes_coco.py")
    subprocess.run(
        [sys.executable, script, "--root", root, "--train-images", "6",
         "--val-images", "3", "--size", "128"],
        check=True,
    )
    return root


def test_layout_and_json_protocol(tiny_shapes_coco):
    root = tiny_shapes_coco
    for split in ("train2017", "val2017", "train2014"):
        ann = os.path.join(root, "annotations", f"instances_{split}.json")
        assert os.path.exists(ann), split
        data = json.load(open(ann))
        assert {"images", "annotations", "categories"} <= set(data)
        assert len(data["categories"]) == 80
        for a in data["annotations"][:5]:
            x, y, w, h = a["bbox"]
            assert w > 0 and h > 0
            assert isinstance(a["segmentation"], list)
            assert all(len(p) >= 6 for p in a["segmentation"])
        for im in data["images"][:2]:
            assert os.path.exists(os.path.join(root, split, im["file_name"]))


def test_registration_and_mask_rasterization(tiny_shapes_coco):
    from unit_tpu.config import get_cfg
    from unit_tpu.data import DatasetCatalog
    from unit_tpu.data.coco import RegisterCOCO, rasterize_polygons

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "COCO",
        "COCO-RCNN-50-C4-split1-segm.yaml",
    ))
    DatasetCatalog.clear()
    RegisterCOCO(cfg, tiny_shapes_coco).register_all()
    recs = DatasetCatalog.get("coco_base_training_query_train")
    assert recs, "no base-class records generated"
    a = recs[0]["annotations"][0]
    assert a["box_mask"].any(), "box-frame mask empty"
    # the drawn polygon must cover a plausible fraction of its box
    m = rasterize_polygons(a["segmentation"], recs[0]["height"], recs[0]["width"])
    x1, y1, x2, y2 = [int(v) for v in a["bbox"]]
    box_area = max((x2 - x1) * (y2 - y1), 1)
    frac = m[y1:y2, x1:x2].sum() / box_area
    assert 0.1 < frac <= 1.0, frac
    DatasetCatalog.clear()
