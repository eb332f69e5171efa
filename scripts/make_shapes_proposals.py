#!/usr/bin/env python
"""Generate MCG-style precomputed proposal files for shapes-COCO.

The dock suite loads external proposals (DATASETS.PROPOSAL_FILES_*) instead of
running an RPN.  This stand-in emits, per image: every GT box, jittered copies,
and random boxes — enough recall for the detector to train, in the
{image_id: {"boxes": [N,4] XYXY, "scores": [N]}} pickle layout
`unit_tpu.data.proposals.load_proposal_file` consumes.

  python scripts/make_shapes_proposals.py --root /root/data/shapes_coco \
      --splits train2014 val2014 --per-image 100
"""

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--splits", nargs="+", default=["train2014", "val2014"])
    ap.add_argument("--per-image", type=int, default=100)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for split in args.splits:
        ann_path = os.path.join(args.root, "annotations", f"instances_{split}.json")
        data = json.load(open(ann_path))
        gts = {}
        for a in data["annotations"]:
            x, y, w, h = a["bbox"]
            gts.setdefault(a["image_id"], []).append([x, y, x + w, y + h])
        out = {}
        for im in data["images"]:
            W, H = im["width"], im["height"]
            boxes = [np.asarray(gts.get(im["id"], []), np.float32).reshape(-1, 4)]
            # jittered GT copies
            for g in boxes[0]:
                j = rng.randn(8, 4) * 4.0
                boxes.append(np.clip(g[None] + j, 0, [W, H, W, H]).astype(np.float32))
            # random boxes for background coverage
            n_rand = args.per_image
            x1 = rng.rand(n_rand) * (W - 16)
            y1 = rng.rand(n_rand) * (H - 16)
            bw = 16 + rng.rand(n_rand) * (W / 2)
            bh = 16 + rng.rand(n_rand) * (H / 2)
            rnd = np.stack([x1, y1, np.minimum(x1 + bw, W), np.minimum(y1 + bh, H)],
                           axis=1).astype(np.float32)
            boxes.append(rnd)
            all_boxes = np.concatenate(boxes, axis=0)
            out[str(im["id"])] = {
                "boxes": all_boxes,
                "scores": np.linspace(1.0, 0.0, len(all_boxes)).astype(np.float32),
            }
        path = os.path.join(args.root, f"proposals_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(out, f)
        print(f"{path}: {len(out)} images")


if __name__ == "__main__":
    main()
