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


def pad_record_proposals(rec: dict, scale: float, capacity: int):
    """Fixed-shape (boxes [P, 4], valid [P]) in network-input coords."""
    boxes = np.zeros((capacity, 4), np.float32)
    valid = np.zeros((capacity,), bool)
    props = rec.get("proposals")
    if props is not None and len(props):
        n = min(len(props), capacity)
        boxes[:n] = props[:n] * scale
        valid[:n] = True
    return boxes, valid
