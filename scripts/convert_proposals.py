#!/usr/bin/env python
"""Convert external precomputed-proposal dumps into the LOAD_PROPOSALS format.

TPU-native rebuild of the reference's proposal converters
(/root/reference/data/data_utils/convert_proposals_to_detectron.py and
convert_coco_proposals_to_detectron.py), as a proper CLI instead of
hardcoded-path scripts.  Both emit the detectron-style parallel-array pickle
``{ids, boxes, objectness_logits}`` that unit_tpu.data.proposals.load_proposal_file
consumes (DATASETS.PROPOSAL_FILES_* + MODEL.LOAD_PROPOSALS, the dock suite).

Two sources:

  voc       legacy WSDDN-style pickles ``{indexes, boxes, scores}``; image ids
            are formatted per VOC year ("%06d" for 2007 test/trainval,
            "YYYY_NNNNNN" for 2012 — convert_proposals_to_detectron.py:12-15)

  coco-mcg  per-image MCG ``.mat`` files with 1-based (ymin, xmin, ymax, xmax)
            ``boxes`` + ``scores``; converted to 0-based XYXY, image id taken
            from the trailing integer of the filename
            (convert_coco_proposals_to_detectron.py:38-58)

Usage:
  python scripts/convert_proposals.py voc in.pkl out.pkl [--voc-year 2007]
  python scripts/convert_proposals.py coco-mcg mat_dir/ out.pkl
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np


def convert_voc(in_path: str, out_path: str, voc_year: int = 2007) -> int:
    with open(in_path, "rb") as f:
        data = pickle.load(f)
    if voc_year == 2012:
        # VOC2012 image ids look like "2012_003541": the raw index packs
        # year + number as one integer
        ids = [f"{str(i)[:4]}_{str(i)[4:]}" for i in data["indexes"]]
    else:
        ids = ["%06d" % i for i in data["indexes"]]
    out = {
        "ids": ids,
        "boxes": [np.asarray(b, np.float32) for b in data["boxes"]],
        "objectness_logits": list(data["scores"]),
    }
    with open(out_path, "wb") as f:
        pickle.dump(out, f, -1)
    return len(ids)


def convert_coco_mcg(mat_dir: str, out_path: str) -> int:
    from scipy.io import loadmat

    ids, boxes, scores = [], [], []
    for mat_file in sorted(glob.glob(os.path.join(mat_dir, "*.mat"))):
        m = loadmat(mat_file)
        # MCG boxes are 1-based (ymin, xmin, ymax, xmax); emit 0-based XYXY
        b = np.asarray(m["boxes"], np.float32) - 1.0
        b = b[:, [1, 0, 3, 2]]
        stem = os.path.splitext(os.path.basename(mat_file))[0]
        ids.append(str(int(stem.split("_")[-1])))
        boxes.append(b)
        scores.append(np.squeeze(np.asarray(m["scores"], np.float32)))
    out = {"ids": ids, "boxes": boxes, "objectness_logits": scores}
    with open(out_path, "wb") as f:
        pickle.dump(out, f, -1)
    return len(ids)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_voc = sub.add_parser("voc", help="legacy VOC proposal pickle")
    p_voc.add_argument("input")
    p_voc.add_argument("output")
    p_voc.add_argument("--voc-year", type=int, default=2007, choices=(2007, 2012))
    p_mcg = sub.add_parser("coco-mcg", help="directory of MCG .mat files")
    p_mcg.add_argument("input")
    p_mcg.add_argument("output")
    args = ap.parse_args(argv)

    if os.path.exists(args.output):
        sys.exit(f"refusing to overwrite {args.output}")
    if args.cmd == "voc":
        n = convert_voc(args.input, args.output, args.voc_year)
    else:
        n = convert_coco_mcg(args.input, args.output)
    print(f"wrote {n} images of proposals to {args.output}")


if __name__ == "__main__":
    main()
