from . import boxes
from .boxes import (
    area,
    pairwise_intersection,
    pairwise_iou,
    pairwise_ioa,
    clip_boxes,
    nonempty,
    get_deltas,
    apply_deltas,
)
from .instances import GTInstances, Proposals, SampledProposals, Detections

__all__ = [
    "boxes",
    "area",
    "pairwise_intersection",
    "pairwise_iou",
    "pairwise_ioa",
    "clip_boxes",
    "nonempty",
    "get_deltas",
    "apply_deltas",
    "GTInstances",
    "Proposals",
    "SampledProposals",
    "Detections",
]
