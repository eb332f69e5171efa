#!/usr/bin/env python
"""Replay tests/fixtures/coco_eval_fixture.json through pycocotools.

Run this anywhere pycocotools IS installed (it is absent from the build image)
to independently verify unit_tpu's COCO evaluator:

    python scripts/verify_coco_eval_pycocotools.py
"""

import json
import os
import sys

import numpy as np


def main():
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "coco_eval_fixture.json",
    )
    fx = json.load(open(path))
    gt = COCO()
    gt.dataset = fx["gt"]
    gt.createIndex()
    dt = gt.loadRes(fx["detections"])
    ev = COCOeval(gt, dt, iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    expected = np.asarray(fx["expected_stats"]) / 100.0  # fixture is 0-100
    diff = np.abs(ev.stats - expected)
    for name, got, want in zip(fx["stat_names"], ev.stats, expected):
        print(f"  {name:6s} pycocotools={got:.6f} unit_tpu={want:.6f}")
    if np.all(diff < 1e-6):
        print("OK: all 12 stats match pycocotools to <1e-6")
        return 0
    print(f"MISMATCH: max diff {diff.max():.2e}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
