#!/usr/bin/env python
"""Dataset bootstrap CLI (parity with the reference's data/prepare_voc.py).

Downloads the PASCAL VOC 2007+2012 devkits (when network egress is available),
extracts them under --data-root, and writes the deterministic seeded k-shot
split files for every (shots, seed) combination so fine-tuning runs are
reproducible.  The reference instead clones bingykang/Fewshot_Detection to copy
its canonical split files (prepare_voc.py:144-189); without egress to that repo
the seeded generator in unit_tpu.data.voc.kshot_sample plays that role.
"""

import argparse
import json
import os
import sys
import tarfile
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VOC_URLS = [
    "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar",
    "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar",
    "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar",
]


def download_and_extract(url: str, dest: str):
    fname = os.path.join(dest, os.path.basename(url))
    if not os.path.exists(fname):
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, fname)
    print(f"extracting {fname}")
    with tarfile.open(fname) as tar:
        tar.extractall(dest)


def write_kshot_splits(devkit_root: str, out_dir: str, shots_list, seeds):
    from unit_tpu.data.voc import load_voc_split, kshot_sample

    os.makedirs(out_dir, exist_ok=True)
    records = load_voc_split(devkit_root, "2007", "trainval", None)
    records += load_voc_split(devkit_root, "2012", "trainval", None)
    all_ids = list(range(20))
    for shots in shots_list:
        for seed in seeds:
            sel = kshot_sample(records, shots, all_ids, seed)
            path = os.path.join(out_dir, f"kshot_{shots}_seed{seed}.json")
            with open(path, "w") as f:
                json.dump([r["image_id"] for r in sel], f)
            print(f"wrote {path} ({len(sel)} images)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="datasets")
    ap.add_argument("--skip-download", action="store_true")
    ap.add_argument("--shots", type=int, nargs="+", default=[1, 2, 3, 5, 10])
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    args = ap.parse_args()

    os.makedirs(args.data_root, exist_ok=True)
    if not args.skip_download:
        for url in VOC_URLS:
            download_and_extract(url, args.data_root)
    devkit = os.path.join(args.data_root, "VOCdevkit")
    write_kshot_splits(
        devkit, os.path.join(args.data_root, "vocsplit"), args.shots, args.seeds
    )


if __name__ == "__main__":
    main()
