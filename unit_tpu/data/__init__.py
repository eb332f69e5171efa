from .catalog import DatasetCatalog, MetadataCatalog
from .transforms import TransformConfig, prepare_detection_record, collate
from .loader import (
    StreamLoader,
    Prefetcher,
    build_strong_loader,
    build_classifier_loader,
    build_test_loader,
    sample_classifier_dataset,
)
from .voc import RegisterVOC, parse_voc_xml, load_voc_split, kshot_sample
from .coco import RegisterCOCO, RegisterCOCONote, RegisterCOCODock

__all__ = [
    "DatasetCatalog", "MetadataCatalog", "TransformConfig",
    "prepare_detection_record", "collate", "StreamLoader", "Prefetcher",
    "build_strong_loader", "build_classifier_loader", "build_test_loader",
    "sample_classifier_dataset", "RegisterVOC", "parse_voc_xml",
    "load_voc_split", "kshot_sample", "RegisterCOCO", "RegisterCOCONote",
    "RegisterCOCODock",
]
