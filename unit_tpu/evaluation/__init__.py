from .voc_eval import PascalVOCEvaluator, voc_ap, eval_class
from .evaluator import inference_on_dataset, inference_on_dataset_meta

__all__ = [
    "PascalVOCEvaluator",
    "voc_ap",
    "eval_class",
    "inference_on_dataset",
    "inference_on_dataset_meta",
]
