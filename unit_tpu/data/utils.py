"""Dataset registration dispatch + evaluator factory.

Rebuild of /root/reference/data/utils.py: ``register_datasets`` dispatches on
``DATASETS.FEWSHOT.TYPE`` (:32-51) and ``get_evaluator`` returns the right
evaluator for a dataset's metadata ``evaluator_type`` (:53-94).
"""

from __future__ import annotations

from .catalog import DatasetCatalog, MetadataCatalog
from ..evaluation.voc_eval import PascalVOCEvaluator


def register_datasets(cfg, devkit_root: str | None = None):
    ds_type = cfg.DATASETS.FEWSHOT.TYPE
    if ds_type in ("VOC", "VOC2007"):
        from .voc import RegisterVOC

        RegisterVOC(cfg, devkit_root).register_all()
    elif ds_type in ("COCO", "COCO_NOTE", "COCO_DOCK"):
        from .coco import RegisterCOCO

        RegisterCOCO(cfg, devkit_root).register_all()
    else:
        raise ValueError(f"Unknown FEWSHOT.TYPE: {ds_type}")


def get_evaluator(cfg, dataset_name: str):
    meta = MetadataCatalog.get(dataset_name)
    ev_type = meta.get("evaluator_type", "pascal_voc")
    if ev_type == "pascal_voc":
        return PascalVOCEvaluator(
            class_names=meta.get("thing_classes"),
            novel_class_ids=cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID,
            use_07_metric=int(meta.get("year", 2007)) == 2007,
        )
    if ev_type == "coco":
        from ..evaluation.coco_eval import COCOEvaluator

        return COCOEvaluator(
            class_names=meta.get("thing_classes"),
            novel_class_ids=cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID,
        )
    raise ValueError(f"Unknown evaluator type {ev_type} for {dataset_name}")
