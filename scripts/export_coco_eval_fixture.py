#!/usr/bin/env python
"""Export a frozen COCOeval validation fixture for out-of-image verification.

pycocotools is not available in this image, so unit_tpu's COCO evaluator
(unit_tpu/evaluation/coco_eval.py, the rebuild of the protocol consumed by the
reference's COCOEvaluatorWeakEvaluator, /root/reference/data/evaluators.py:246-339)
is validated in-tree against an independently transcribed oracle
(tests/test_coco_eval_oracle.py).  This script freezes an EXPORTABLE fixture —
COCO-format GT json + detection results + the 12 expected stats — so anyone
with pycocotools can verify the implementation with one command:

    python scripts/export_coco_eval_fixture.py          # (re)generate fixture
    python scripts/verify_coco_eval_pycocotools.py      # replay where pycocotools exists

The fixture is deterministic (seeded) and exercises: multiple images/classes,
small/medium/large GT areas, crowd regions, false positives, duplicate
detections, score ties, and images with no GT.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "coco_eval_fixture.json"
)

NUM_CLASSES = 6
NUM_IMAGES = 12
IMG_H, IMG_W = 480, 640


def build_fixture():
    rng = np.random.RandomState(42)
    images, annotations, detections = [], [], []
    ann_id = 1
    for img_id in range(1, NUM_IMAGES + 1):
        images.append({"id": img_id, "height": IMG_H, "width": IMG_W})
        if img_id == NUM_IMAGES:  # one image with no GT at all
            n_gt = 0
        else:
            n_gt = rng.randint(1, 6)
        gt_boxes = []
        for _ in range(n_gt):
            # area mix: small (<32^2), medium, large (>96^2)
            kind = rng.randint(3)
            side = {0: rng.uniform(8, 30), 1: rng.uniform(40, 90),
                    2: rng.uniform(100, 240)}[kind]
            w = side * rng.uniform(0.7, 1.4)
            h = side * rng.uniform(0.7, 1.4)
            x = rng.uniform(0, IMG_W - w)
            y = rng.uniform(0, IMG_H - h)
            cat = int(rng.randint(1, NUM_CLASSES + 1))
            iscrowd = int(rng.rand() < 0.1)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "bbox": [round(x, 2), round(y, 2), round(w, 2), round(h, 2)],
                "area": round(w * h, 2), "iscrowd": iscrowd,
            })
            gt_boxes.append((x, y, w, h, cat, iscrowd))
            ann_id += 1
        # detections: jittered true positives (some duplicated), plus FPs
        for (x, y, w, h, cat, iscrowd) in gt_boxes:
            for dup in range(1 + int(rng.rand() < 0.3)):
                jx = x + rng.randn() * 0.06 * w
                jy = y + rng.randn() * 0.06 * h
                jw = w * rng.uniform(0.85, 1.15)
                jh = h * rng.uniform(0.85, 1.15)
                # quantized scores force score ties across images
                score = round(rng.uniform(0.3, 0.99), 2)
                wrong_cls = int(rng.rand() < 0.12)
                dcat = int(rng.randint(1, NUM_CLASSES + 1)) if wrong_cls else cat
                detections.append({
                    "image_id": img_id, "category_id": dcat,
                    "bbox": [round(jx, 2), round(jy, 2), round(jw, 2), round(jh, 2)],
                    "score": score,
                })
        for _ in range(rng.randint(0, 4)):  # pure false positives
            w = rng.uniform(10, 150)
            h = rng.uniform(10, 150)
            x = rng.uniform(0, IMG_W - w)
            y = rng.uniform(0, IMG_H - h)
            detections.append({
                "image_id": img_id,
                "category_id": int(rng.randint(1, NUM_CLASSES + 1)),
                "bbox": [round(x, 2), round(y, 2), round(w, 2), round(h, 2)],
                "score": round(rng.uniform(0.05, 0.6), 2),
            })
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i, "name": f"class_{i}"} for i in range(1, NUM_CLASSES + 1)
        ],
    }
    return gt, detections


def run_unit_tpu_eval(gt, detections):
    """Feed the fixture through unit_tpu's COCOEvaluator -> 12 stats (0-100)."""
    from unit_tpu.evaluation.coco_eval import COCOEvaluator

    ev = COCOEvaluator([f"class_{i}" for i in range(1, NUM_CLASSES + 1)])
    anns_by_img = {}
    for ann in gt["annotations"]:
        anns_by_img.setdefault(ann["image_id"], []).append(ann)
    for img in gt["images"]:
        x = [
            {
                # internal evaluator consumes XYXY + 0-based class ids
                "bbox": [a["bbox"][0], a["bbox"][1],
                         a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]],
                "category_id": a["category_id"] - 1,
                "area": a["area"],
                "iscrowd": a["iscrowd"],
            }
            for a in anns_by_img.get(img["id"], [])
        ]
        ev.process_gt_record({
            "image_id": img["id"], "height": img["height"], "width": img["width"],
            "annotations": x,
        })
    dets_by_img = {}
    for d in detections:
        dets_by_img.setdefault(d["image_id"], []).append(d)
    for img_id, ds in dets_by_img.items():
        boxes = np.asarray(
            [[d["bbox"][0], d["bbox"][1],
              d["bbox"][0] + d["bbox"][2], d["bbox"][1] + d["bbox"][3]]
             for d in ds], np.float64)
        scores = np.asarray([d["score"] for d in ds])
        classes = np.asarray([d["category_id"] - 1 for d in ds])
        ev.process(img_id, boxes, scores, classes, np.ones(len(ds), bool))
    res = ev.evaluate()["bbox"]
    order = ["AP", "AP50", "AP75", "APs", "APm", "APl",
             "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"]
    return [res[k] for k in order]


def main():
    gt, detections = build_fixture()
    stats = run_unit_tpu_eval(gt, detections)
    os.makedirs(os.path.dirname(os.path.abspath(FIXTURE)), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump({
            "description": (
                "Frozen COCOeval validation fixture: replay gt+detections "
                "through pycocotools COCOeval (iouType bbox) and compare "
                "stats/100 (pycocotools reports fractions, these are 0-100)."
            ),
            "gt": gt,
            "detections": detections,
            "expected_stats": stats,
            "stat_names": ["AP", "AP50", "AP75", "APs", "APm", "APl",
                           "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"],
        }, f, indent=1)
    print(f"wrote {os.path.abspath(FIXTURE)}")
    for name, v in zip(
        ["AP", "AP50", "AP75", "APs", "APm", "APl",
         "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"], stats
    ):
        print(f"  {name:6s} {v:8.4f}")


if __name__ == "__main__":
    main()
