"""Canonical few-shot split-file loading (bingykang layout).

Covers ``load_kshot_split_files`` (unit_tpu/data/voc.py) — the drop-in path for
the reference's canonical `box_{K}shot_{cls}_train.txt` split files
(/root/reference/data/prepare_voc.py:144-189) — and its precedence over seeded
``kshot_sample`` inside ``RegisterVOC.register_all``.

To run a parity experiment with the reference's exact splits: place the
Fewshot_Detection `vocsplit/` directory as a sibling of the VOCdevkit root
(i.e. `<parent>/VOCdevkit/` and `<parent>/vocsplit/`); registration picks the
canonical files up automatically.
"""

import os

import numpy as np
import pytest

from unit_tpu.config import get_cfg
from unit_tpu.data import DatasetCatalog, RegisterVOC
from unit_tpu.data.voc import load_kshot_split_files
from unit_tpu.models.similarity import VOC_CLASSES

_XML = """<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object><name>{name}</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>40</ymax></bndbox>
  </object>
</annotation>"""


@pytest.fixture
def devkit_with_splits(tmp_path):
    """VOC2007 devkit (6 single-object images) + a sibling ``vocsplit`` dir
    with 1-shot canonical files for three classes."""
    root = tmp_path / "VOCdevkit"
    base = root / "VOC2007"
    (base / "Annotations").mkdir(parents=True)
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "JPEGImages").mkdir(parents=True)
    classes = ["aeroplane", "bicycle", "bird", "boat", "bottle", "bus"]
    ids = []
    for i, cls in enumerate(classes):
        image_id = f"00000{i}"
        ids.append(image_id)
        (base / "Annotations" / f"{image_id}.xml").write_text(
            _XML.format(name=cls)
        )
    (base / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids))
    # empty VOC2012 skeleton (registration loads both years)
    base12 = root / "VOC2012"
    (base12 / "ImageSets" / "Main").mkdir(parents=True)
    (base12 / "ImageSets" / "Main" / "trainval.txt").write_text("")

    split_dir = tmp_path / "vocsplit"
    split_dir.mkdir()
    # canonical layout: one line per shot, full JPEG path (darknet style)
    chosen = {"aeroplane": "000000", "bicycle": "000001", "bird": "000002"}
    for cls, image_id in chosen.items():
        (split_dir / f"box_1shot_{cls}_train.txt").write_text(
            str(base / "JPEGImages" / f"{image_id}.jpg") + "\n"
        )
    return str(root), str(split_dir), chosen


def test_load_kshot_split_files(devkit_with_splits):
    root, split_dir, chosen = devkit_with_splits
    recs = load_kshot_split_files(split_dir, 1, VOC_CLASSES, root)
    assert recs is not None
    got = sorted(r["image_id"] for r in recs)
    assert got == sorted(chosen.values())
    # records are fully parsed (boxes 0-based, file_name resolvable)
    for r in recs:
        assert r["annotations"] and r["annotations"][0]["bbox"][0] == 9.0
        assert r["file_name"].endswith(f"{r['image_id']}.jpg")


def test_load_kshot_split_files_absent_dir(devkit_with_splits):
    root, split_dir, _ = devkit_with_splits
    assert load_kshot_split_files(split_dir + "_nope", 1, VOC_CLASSES, root) is None
    # dir exists but no files for this K -> None (falls back to seeded sampling)
    assert load_kshot_split_files(split_dir, 5, VOC_CLASSES, root) is None


def test_canonical_splits_take_precedence(devkit_with_splits):
    root, split_dir, chosen = devkit_with_splits
    DatasetCatalog.clear()
    cfg = get_cfg()
    cfg.DATASETS.CLASSIFIER_DATAROOT = root
    cfg.DATASETS.FEWSHOT.NUM_SHOTS = 1
    RegisterVOC(cfg, root).register_all()
    ft = DatasetCatalog.get("voc_fine_tuning_query_train")
    assert sorted(r["image_id"] for r in ft) == sorted(chosen.values())


def test_seeded_fallback_when_no_split_files(devkit_with_splits, tmp_path):
    root, split_dir, _ = devkit_with_splits
    # remove the canonical files -> registration falls back to kshot_sample
    for f in os.listdir(split_dir):
        os.remove(os.path.join(split_dir, f))
    os.rmdir(split_dir)
    DatasetCatalog.clear()
    cfg = get_cfg()
    cfg.DATASETS.CLASSIFIER_DATAROOT = root
    cfg.DATASETS.FEWSHOT.NUM_SHOTS = 1
    RegisterVOC(cfg, root).register_all()
    ft = DatasetCatalog.get("voc_fine_tuning_query_train")
    assert len(ft) > 0
    counts = {}
    for rec in ft:
        for ann in rec["annotations"]:
            counts[ann["category_id"]] = counts.get(ann["category_id"], 0) + 1
    assert all(v <= 1 for v in counts.values())
