#!/usr/bin/env python
"""COCO dataset bootstrap CLI.

(The reference's data/prepare_coco.py is an incomplete stub that downloads the
wrong tars, SURVEY.md §2.4; this is the completed equivalent.)  Downloads COCO
2017 images + annotations when egress is available and extracts them under
--data-root in the layout RegisterCOCO expects
(<root>/train2017, <root>/val2017, <root>/annotations/instances_*.json).
"""

import argparse
import os
import urllib.request
import zipfile

COCO_URLS = [
    "http://images.cocodataset.org/zips/train2017.zip",
    "http://images.cocodataset.org/zips/val2017.zip",
    "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
]


def download_and_extract(url: str, dest: str):
    fname = os.path.join(dest, os.path.basename(url))
    if not os.path.exists(fname):
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, fname)
    print(f"extracting {fname}")
    with zipfile.ZipFile(fname) as z:
        z.extractall(dest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="datasets/coco")
    args = ap.parse_args()
    os.makedirs(args.data_root, exist_ok=True)
    for url in COCO_URLS:
        download_and_extract(url, args.data_root)


if __name__ == "__main__":
    main()
