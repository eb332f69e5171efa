"""Precomputed proposal files (MCG) for the LOAD_PROPOSALS path.

Rebuild of the reference's proposal plumbing for the "dock" suite
(DATASETS.PROPOSAL_FILES_* + MODEL.LOAD_PROPOSALS,
configs/COCO/COCO-VGG-CNN-F-split1-dock.yaml; converters at
data/data_utils/convert_proposals_to_detectron.py): a proposal file maps
image_id -> {"boxes": [N, 4] XYXY, "scores": [N]}; the loaders attach the top-K
per image as fixed-shape padded arrays.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import numpy as np


def load_proposal_file(path: str) -> Dict[str, dict]:
    """Load a proposal pickle/npz into {image_id: {boxes, scores}}."""
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
        obj = data["proposals"].item() if "proposals" in data else data
    else:
        with open(path, "rb") as f:
            obj = pickle.load(f)
    # accept either {id: {boxes, scores}} or parallel-array layouts
    if "ids" in obj and "boxes" in obj:
        out = {}
        for i, image_id in enumerate(obj["ids"]):
            out[str(image_id)] = {
                "boxes": np.asarray(obj["boxes"][i], np.float32),
                "scores": np.asarray(
                    obj.get("objectness_logits", obj.get("scores"))[i], np.float32
                ),
            }
        return out
    return {
        str(k): {
            "boxes": np.asarray(v["boxes"], np.float32),
            "scores": np.asarray(v.get("scores", v.get("objectness_logits")), np.float32),
        }
        for k, v in obj.items()
    }


def attach_proposals(
    records: List[dict], proposal_files, topk: int
) -> List[dict]:
    """Attach top-k proposals (sorted by score) to each record in place."""
    table: Dict[str, dict] = {}
    for path in proposal_files or ():
        if os.path.exists(path):
            table.update(load_proposal_file(path))
    if not table:
        return records
    for rec in records:
        entry = table.get(str(rec["image_id"]))
        if entry is None:
            continue
        order = np.argsort(-entry["scores"])[:topk]
        rec["proposals"] = entry["boxes"][order]
        rec["proposal_scores"] = entry["scores"][order]
    return records


def pad_record_proposals(
    rec: dict, scale: float, capacity: int, new_w: float = None, new_h: float = None
):
    """Fixed-shape (boxes [P, 4], valid [P]) in network-input coords.

    Like the reference's ``transform_proposals`` (d2 detection_utils), scaled
    boxes are clipped to the resized image and degenerate (empty after clip)
    boxes are marked invalid.  Clipping also preserves the Pallas ROIAlign
    backward kernel's row-window assumption (bin_h <= H/pool), which
    out-of-image boxes would silently break.
    """
    boxes = np.zeros((capacity, 4), np.float32)
    valid = np.zeros((capacity,), bool)
    props = rec.get("proposals")
    if props is not None and len(props):
        n = min(len(props), capacity)
        b = props[:n] * scale
        if new_w is not None:
            b[:, 0::2] = np.clip(b[:, 0::2], 0.0, float(new_w))
        if new_h is not None:
            b[:, 1::2] = np.clip(b[:, 1::2], 0.0, float(new_h))
        boxes[:n] = b
        valid[:n] = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
    return boxes, valid
