from .voc_eval import PascalVOCEvaluator, voc_ap, eval_class
from .evaluator import inference_on_dataset

__all__ = ["PascalVOCEvaluator", "voc_ap", "eval_class", "inference_on_dataset"]
