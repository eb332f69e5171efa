"""Host-side image transforms producing static-shape device batches.

Replaces the reference's DatasetMapper + dynamic ``ImageList.from_tensors`` padding
(rcnn.py:257-266) with resize-shortest-edge / random-flip / pad-to-fixed-canvas:
every train batch has one compile-time shape (SURVEY.md §5 "long-context" row).
Images are loaded as BGR float32 (caffe-style, INPUT.FORMAT=BGR) to match the
pretrained pixel means.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class TransformConfig:
    min_sizes: Sequence[int] = (800,)
    max_size: int = 1333
    canvas: Tuple[int, int] = (800, 1344)     # fixed (H, W) compile bucket
    flip: bool = True
    max_gt: int = 100
    num_classes: int = 20
    with_masks: bool = False
    mask_size: int = 28                       # GT-box-frame mask resolution
    proposal_capacity: int = 0                # >0: attach padded precomputed proposals
    host_uint8: bool = False                  # ship batches as uint8 (TPU.HOST_TRANSFER_UINT8)

    @classmethod
    def train_from_cfg(cls, cfg) -> "TransformConfig":
        min_sizes = cfg.INPUT.MIN_SIZE_TRAIN
        if isinstance(min_sizes, int):
            min_sizes = (min_sizes,)
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        canvas = _canvas_for(max(min_sizes), max_size, cfg.TPU.SIZE_DIVISIBILITY)
        return cls(
            min_sizes=tuple(min_sizes), max_size=max_size, canvas=canvas,
            flip=cfg.INPUT.RANDOM_FLIP != "none", max_gt=cfg.TPU.MAX_GT_BOXES,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            with_masks=cfg.MODEL.MASK_ON,
            host_uint8=cfg.TPU.HOST_TRANSFER_UINT8,
        )

    @classmethod
    def test_from_cfg(cls, cfg) -> "TransformConfig":
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        canvas = _canvas_for(min_size, max_size, cfg.TPU.SIZE_DIVISIBILITY)
        return cls(
            min_sizes=(min_size,), max_size=max_size, canvas=canvas, flip=False,
            max_gt=cfg.TPU.MAX_GT_BOXES, num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        )


def _canvas_for(min_size: int, max_size: int, divisibility: int) -> Tuple[int, int]:
    def rup(x):
        return ((x + divisibility - 1) // divisibility) * divisibility

    return (rup(min_size), rup(max_size))


def tta_canvas_for(
    min_size: int, max_size: int, divisibility: int, max_aspect: float
) -> Tuple[int, int]:
    """Tight per-scale TTA canvas (round-5 TTA lever, BASELINE.md).

    ``_canvas_for`` pads every TTA variant to the global ``TEST.AUG.MAX_SIZE``
    on the long side (e.g. 480x2000 for a 480x800 variant — 2.5x wasted
    backbone pixels).  A shortest-edge resize to ``min_size`` can only produce
    a long side of ``min_size * aspect`` (capped at ``max_size``), so with the
    dataset's max aspect ratio known the canvas shrinks to the content bound.
    Semantics-preserving: the content region is identical, zero padding beyond
    it is identical (convs are local), only the dead padded columns disappear.
    """

    def rup(x):
        return ((x + divisibility - 1) // divisibility) * divisibility

    import math

    long_side = min(int(math.ceil(min_size * max_aspect)), max_size)
    return (rup(min_size), rup(max(long_side, min_size)))


def max_aspect_of(records) -> float:
    """Max(long/short) aspect ratio over a dataset's records (TTA canvases)."""
    ar = 1.0
    for r in records:
        w, h = float(r.get("width", 0) or 0), float(r.get("height", 0) or 0)
        if w > 0 and h > 0:
            ar = max(ar, w / h, h / w)
    return ar


def oriented_canvas(h: int, w: int, canvas: Tuple[int, int]) -> Tuple[int, int]:
    """Orientation-bucketed fixed canvas (d2 AspectRatioGroupedDataset
    equivalent): portrait content (h > w) gets the transposed canvas so tall
    images are never cropped — one compile bucket per orientation.  The SINGLE
    source of this rule; the loaders, transforms and serving path must agree
    or a request lands on a canvas with no compiled program."""
    ch, cw = canvas
    if h > w:
        return max(ch, cw), min(ch, cw)
    return min(ch, cw), max(ch, cw)


def resize_shortest_edge(h: int, w: int, min_size: int, max_size: int) -> Tuple[int, int, float]:
    """New (h, w, scale) with shortest edge = min_size, longest capped at max_size."""
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    return int(round(h * scale)), int(round(w * scale)), scale


def resize_image(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Bilinear resize HxWx3 float32 via separable linear interpolation."""
    h, w = img.shape[:2]
    if (new_h, new_w) == (h, w):  # identity resample: skip the gather passes
        return np.asarray(img, np.float32)
    ys = (np.arange(new_h) + 0.5) * (h / new_h) - 0.5
    xs = (np.arange(new_w) + 0.5) * (w / new_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def load_image_bgr(path: str) -> np.ndarray:
    """Read an image file to float32 BGR HxWx3."""
    from PIL import Image

    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.float32)
    return rgb[:, :, ::-1].copy()


def prepare_detection_record(
    record: dict,
    tcfg: TransformConfig,
    rng: np.random.RandomState,
    image: np.ndarray | None = None,
    training: bool = True,
    preprocessed: tuple | None = None,
    aug: tuple | None = None,
) -> dict:
    """record dict -> fixed-shape arrays for one image.

    Returns {image [Hc, Wc, 3], image_size [2], gt_boxes [G, 4], gt_classes [G],
    gt_valid [G], labels [C], scale}.

    ``preprocessed=(canvas, new_h, new_w, scale[, flipped])``: the
    decode+resize(+flip)+canvas work was already done (by the native C loader,
    data/native.py); only the annotation-side transform runs here, with the GT
    flip mirrored when the image was pre-flipped.

    ``aug=(min_size, flip)``: the caller already drew the augmentation
    parameters (StreamLoader._load draws them once so the native path and the
    PIL fallback stay on the same rng stream); no draws happen here.
    """
    if preprocessed is not None:
        canvas, new_h, new_w, scale = preprocessed[:4]
        flipped = bool(preprocessed[4]) if len(preprocessed) > 4 else False
        h, w = int(record["height"]), int(record["width"])
    else:
        if image is None:
            image = load_image_bgr(record["file_name"])
        h, w = image.shape[:2]
        if aug is not None:
            min_size = aug[0]
        else:
            min_size = tcfg.min_sizes[rng.randint(len(tcfg.min_sizes))] if training else tcfg.min_sizes[0]
        new_h, new_w, scale = resize_shortest_edge(h, w, min_size, tcfg.max_size)
        ch, cw = oriented_canvas(h, w, tcfg.canvas)
        new_h, new_w = min(new_h, ch), min(new_w, cw)
        img = resize_image(image, new_h, new_w)

        flipped = (bool(aug[1]) if aug is not None
                   else training and tcfg.flip and rng.rand() < 0.5)
        if flipped:
            img = img[:, ::-1]

        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:new_h, :new_w] = img[:new_h, :new_w]

    boxes = np.asarray(
        [a["bbox"] for a in record.get("annotations", [])], np.float32
    ).reshape(-1, 4) * scale
    classes = np.asarray(
        [a["category_id"] for a in record.get("annotations", [])], np.int64
    )
    if flipped and len(boxes):
        x1 = new_w - boxes[:, 2]
        x2 = new_w - boxes[:, 0]
        boxes[:, 0], boxes[:, 2] = x1.copy(), x2.copy()

    g = tcfg.max_gt
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_classes = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    n = min(len(boxes), g)
    if n:
        gt_boxes[:n] = boxes[:n]
        gt_classes[:n] = classes[:n]
        gt_valid[:n] = True

    gt_masks = None
    if tcfg.with_masks:
        m = tcfg.mask_size
        gt_masks = np.zeros((g, m, m), np.float32)
        for i, ann in enumerate(record.get("annotations", [])[:g]):
            bm = ann.get("box_mask")
            if bm is not None:
                bm = bm.astype(np.float32)
                # GT-box-frame masks are resize-invariant; flipping the image
                # mirrors the mask along x
                gt_masks[i] = bm[:, ::-1] if flipped else bm

    labels = np.zeros((tcfg.num_classes,), np.float32)
    for c in classes:
        if 0 <= c < tcfg.num_classes:
            labels[c] = 1.0

    out = {
        "image": canvas,
        "image_size": np.asarray([new_h, new_w], np.float32),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
        "labels": labels,
        "scale": np.float32(scale),
        "image_id": record.get("image_id", ""),
        "orig_size": np.asarray([h, w], np.float32),
    }
    if gt_masks is not None:
        out["gt_masks"] = gt_masks
    if tcfg.proposal_capacity > 0:
        from .proposals import pad_record_proposals

        p_boxes, p_valid = pad_record_proposals(
            record, scale, tcfg.proposal_capacity, new_w=new_w, new_h=new_h
        )
        if flipped:
            x1p = new_w - p_boxes[:, 2]
            x2p = new_w - p_boxes[:, 0]
            p_boxes[:, 0], p_boxes[:, 2] = x1p.copy(), x2p.copy()
        out["proposals"] = p_boxes
        out["proposals_valid"] = p_valid
    return out


def collate(samples: List[dict], keys: Sequence[str]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in keys}
