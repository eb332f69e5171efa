from .meta_arch import ModelConfig, WSRCNN
from .resnet import ResNetC4, Res5, FrozenBN
from .rpn import RPNHead, RPNConfig
from .predictors import SupervisedPredictor, WeakDetectorPredictor
from . import fast_rcnn, rpn, similarity, weak_losses

__all__ = [
    "ModelConfig", "WSRCNN", "ResNetC4", "Res5", "FrozenBN", "RPNHead",
    "RPNConfig", "SupervisedPredictor", "WeakDetectorPredictor",
    "fast_rcnn", "rpn", "similarity", "weak_losses",
]
