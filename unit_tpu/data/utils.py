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
    elif ds_type == "COCO":
        from .coco import RegisterCOCO

        RegisterCOCO(cfg, devkit_root).register_all()
    elif ds_type == "COCO_NOTE":
        from .coco import RegisterCOCONote

        RegisterCOCONote(cfg, devkit_root).register_all()
    elif ds_type == "COCO_DOCK":
        from .coco import RegisterCOCODock

        RegisterCOCODock(cfg, devkit_root).register_all()
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

        bbox_ev = COCOEvaluator(
            class_names=meta.get("thing_classes"),
            novel_class_ids=cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID,
        )
        if not cfg.MODEL.MASK_ON:
            return bbox_ev
        segm_ev = COCOEvaluator(
            class_names=meta.get("thing_classes"),
            novel_class_ids=cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID,
            iou_type="segm",
        )
        return MultiEvaluator([bbox_ev, segm_ev])
    raise ValueError(f"Unknown evaluator type {ev_type} for {dataset_name}")


class MultiEvaluator:
    """Fan-out to several evaluators (bbox + segm, like the reference's
    COCOEvaluator with both iou types)."""

    def __init__(self, evaluators):
        self.evaluators = evaluators

    def reset(self):
        for e in self.evaluators:
            e.reset()

    def process_gt_record(self, record):
        for e in self.evaluators:
            e.process_gt_record(record)

    def process(self, *args, **kwargs):
        for e in self.evaluators:
            e.process(*args, **kwargs)

    def merge_from(self, other: "MultiEvaluator"):
        for e, o in zip(self.evaluators, other.evaluators):
            e.merge_from(o)

    def evaluate(self):
        out = {}
        for e in self.evaluators:
            out.update(e.evaluate())
        return out
