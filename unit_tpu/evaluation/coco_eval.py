"""COCO-style detection/segmentation evaluation with novel-class slicing.

Self-contained reimplementation of the COCOeval protocol (pycocotools is not
available in this image) as consumed by the reference's
COCOEvaluatorWeakEvaluator (/root/reference/data/evaluators.py:246-339): AP/AR
over IoU 0.50:0.95, 101-point precision interpolation, area ranges, maxDets 100,
the standard 12-stat summary, plus ``novel_mean`` = AP50 restricted to the novel
class ids (evaluators.py:288-292,337-339).

Masks are evaluated from padded per-detection mask probabilities pasted into
their boxes at original resolution (RLE-free dense IoU).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _box_iou_matrix(dets: np.ndarray, gts: np.ndarray,
                    iscrowd: Optional[np.ndarray] = None) -> np.ndarray:
    """[D, G] IoU, vectorized (COCO convention, no +1).

    Against a crowd GT the denominator is the DETECTION area only
    (pycocotools ``maskUtils.iou`` iscrowd semantics: a det fully inside a
    crowd region has IoU 1 with it regardless of the crowd's extent)."""
    d, g = len(dets), len(gts)
    if d == 0 or g == 0:
        return np.zeros((d, g))
    dets = np.asarray(dets, np.float64)
    gts = np.asarray(gts, np.float64)
    iw = np.clip(
        np.minimum(dets[:, None, 2], gts[None, :, 2])
        - np.maximum(dets[:, None, 0], gts[None, :, 0]), 0, None)
    ih = np.clip(
        np.minimum(dets[:, None, 3], gts[None, :, 3])
        - np.maximum(dets[:, None, 1], gts[None, :, 1]), 0, None)
    inter = iw * ih
    da = (np.clip(dets[:, 2] - dets[:, 0], 0, None)
          * np.clip(dets[:, 3] - dets[:, 1], 0, None))
    ga = (np.clip(gts[:, 2] - gts[:, 0], 0, None)
          * np.clip(gts[:, 3] - gts[:, 1], 0, None))
    union = da[:, None] + ga[None, :] - inter
    if iscrowd is not None and np.any(iscrowd):
        union = np.where(np.asarray(iscrowd, bool)[None, :], da[:, None], union)
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def _image_lists():
    return defaultdict(list)


class COCOEvaluator:
    """Accumulates per-image detections + GT and computes COCO stats.

    iou_type: 'bbox' or 'segm'.  For 'segm', detections must carry ``masks``
    ([D, M, M] probabilities in the box frame) and GT records dense masks.
    """

    def __init__(
        self,
        class_names: Sequence[str],
        novel_class_ids: Sequence[int] = (),
        iou_type: str = "bbox",
    ):
        self.class_names = list(class_names)
        self.novel_ids = sorted(novel_class_ids)
        self.iou_type = iou_type
        self.reset()

    def reset(self):
        # module-level factory (not a lambda): evaluators must stay picklable
        # for the cross-host gather in inference_on_dataset
        self._gt = defaultdict(_image_lists)   # cls -> img -> list
        self._dt = defaultdict(_image_lists)
        self._images = set()

    # ------------------------------------------------------------- ingestion
    def process_gt_record(self, record: dict):
        img = record["image_id"]
        self._images.add(img)
        for ann in record.get("annotations", []):
            x1, y1, x2, y2 = ann["bbox"]
            mask = ann.get("mask")
            if mask is None and self.iou_type == "segm" and isinstance(
                ann.get("segmentation"), list
            ):
                # pixel-exact polygon rasterization in the image frame
                from ..data.coco import rasterize_polygons

                mask = rasterize_polygons(
                    ann["segmentation"], int(record["height"]), int(record["width"])
                )
            if mask is None and ann.get("box_mask") is not None and self.iou_type == "segm":
                # paste the GT-box-frame bitmask into the image frame
                h, w = int(record["height"]), int(record["width"])
                mask = np.zeros((h, w), bool)
                xi1, yi1 = max(int(np.floor(x1)), 0), max(int(np.floor(y1)), 0)
                xi2, yi2 = min(int(np.ceil(x2)), w), min(int(np.ceil(y2)), h)
                if xi2 > xi1 and yi2 > yi1:
                    from ..data.transforms import resize_image

                    patch = resize_image(
                        ann["box_mask"][:, :, None].astype(np.float32),
                        yi2 - yi1, xi2 - xi1,
                    )[:, :, 0]
                    mask[yi1:yi2, xi1:xi2] = patch > 0.5
            self._gt[ann["category_id"]][img].append({
                "bbox": np.asarray([x1, y1, x2, y2], np.float64),
                "area": ann.get("area", (x2 - x1) * (y2 - y1)),
                "iscrowd": ann.get("iscrowd", 0),
                "mask": mask,
            })

    def process(self, image_id, boxes, scores, classes, valid, masks=None):
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        classes = np.asarray(classes)
        valid = np.asarray(valid)
        self._images.add(image_id)
        for i in range(len(boxes)):
            if not valid[i]:
                continue
            self._dt[int(classes[i])][image_id].append({
                "bbox": boxes[i].astype(np.float64),
                "score": float(scores[i]),
                "mask": None if masks is None else np.asarray(masks[i]),
            })

    def merge_from(self, other: "COCOEvaluator"):
        """Fold another host's accumulated detections/GT in (multi-host eval)."""
        for cid, per_img in other._gt.items():
            for img, gts in per_img.items():
                self._gt[cid][img].extend(gts)
        for cid, per_img in other._dt.items():
            for img, dts in per_img.items():
                self._dt[cid][img].extend(dts)
        self._images |= other._images

    # ------------------------------------------------------------- matching
    def _mask_iou(self, det, gts) -> np.ndarray:
        """Dense IoU between one detection's pasted mask and GT masks."""
        out = np.zeros(len(gts))
        dm = det.get("mask")
        if dm is None:
            return out
        x1, y1, x2, y2 = det["bbox"]
        for j, gt in enumerate(gts):
            gm = gt.get("mask")
            if gm is None:
                continue
            h, w = gm.shape
            canvas = np.zeros((h, w), bool)
            xi1, yi1 = int(max(np.floor(x1), 0)), int(max(np.floor(y1), 0))
            xi2, yi2 = int(min(np.ceil(x2), w)), int(min(np.ceil(y2), h))
            if xi2 > xi1 and yi2 > yi1:
                from ..data.transforms import resize_image

                patch = resize_image(
                    det["mask"][:, :, None].astype(np.float32), yi2 - yi1, xi2 - xi1
                )[:, :, 0]
                canvas[yi1:yi2, xi1:xi2] = patch > 0.5
            inter = np.logical_and(canvas, gm).sum()
            union = np.logical_or(canvas, gm).sum()
            out[j] = inter / union if union > 0 else 0.0
        return out

    def _evaluate_img(self, cls, img, area_rng):
        gts = self._gt[cls].get(img, [])
        dts = sorted(self._dt[cls].get(img, []), key=lambda d: -d["score"])[: MAX_DETS[-1]]
        if not gts and not dts:
            return None
        # closed interval [lo, hi] exactly as pycocotools (area==32**2 counts as
        # both 'small' and 'medium' there)
        ignore_gt = np.asarray(
            [g["iscrowd"] or not (area_rng[0] <= g["area"] <= area_rng[1])
             for g in gts],
            bool,
        )
        order_gt = np.argsort(ignore_gt, kind="stable")  # non-ignored first
        gts = [gts[i] for i in order_gt]
        ignore_gt = ignore_gt[order_gt]

        if self.iou_type == "bbox":
            iou = _box_iou_matrix(
                np.asarray([d["bbox"] for d in dts]).reshape(-1, 4),
                np.asarray([g["bbox"] for g in gts]).reshape(-1, 4),
                iscrowd=np.asarray([g["iscrowd"] for g in gts], bool),
            )
        else:
            iou = np.stack([self._mask_iou(d, gts) for d in dts]) if dts and gts else (
                np.zeros((len(dts), len(gts)))
            )

        t = len(IOU_THRS)
        d = len(dts)
        g = len(gts)
        dt_m = -np.ones((t, d), np.int64)
        gt_m = -np.ones((t, g), np.int64)
        dt_ig = np.zeros((t, d), bool)
        for ti, thr in enumerate(IOU_THRS):
            for di in range(d):
                best, bj = min(thr, 1 - 1e-10), -1
                for gj in range(g):
                    if gt_m[ti, gj] >= 0 and not gts[gj]["iscrowd"]:
                        continue
                    if bj >= 0 and not ignore_gt[bj] and ignore_gt[gj]:
                        break  # gts sorted: once into ignored region with a match, stop
                    if iou[di, gj] < best:
                        continue
                    best, bj = iou[di, gj], gj
                if bj >= 0:
                    dt_m[ti, di] = bj
                    gt_m[ti, bj] = di
                    dt_ig[ti, di] = ignore_gt[bj]
        # unmatched detections outside the area range are ignored
        a = np.asarray(
            [
                (d_["bbox"][2] - d_["bbox"][0]) * (d_["bbox"][3] - d_["bbox"][1])
                for d_ in dts
            ]
        )
        out_of_rng = (a < area_rng[0]) | (a > area_rng[1])
        dt_ig = dt_ig | ((dt_m < 0) & out_of_rng[None, :])
        return {
            "scores": np.asarray([d_["score"] for d_ in dts]),
            "dt_matched": dt_m >= 0,
            "dt_ignore": dt_ig,
            "num_gt": int((~ignore_gt).sum()),
        }

    # ------------------------------------------------------------- accumulate
    def evaluate(self) -> dict:
        k = len(self.class_names)
        t = len(IOU_THRS)
        a = len(AREA_RNG)
        m = len(MAX_DETS)
        precision = -np.ones((t, len(REC_THRS), k, a, m))
        recall = -np.ones((t, k, a, m))

        for ki in range(k):
            for ai, (_, rng) in enumerate(AREA_RNG.items()):
                # deterministic image order: score ties concatenate in a fixed
                # order exactly like pycocotools' sorted imgIds
                evals = [
                    e
                    for img in sorted(self._images, key=str)
                    if (e := self._evaluate_img(ki, img, rng)) is not None
                ]
                if not evals:
                    continue
                npig = sum(e["num_gt"] for e in evals)
                if npig == 0:
                    continue
                for mi, max_det in enumerate(MAX_DETS):
                    scores = np.concatenate([e["scores"][:max_det] for e in evals])
                    matched = np.concatenate(
                        [e["dt_matched"][:, :max_det] for e in evals], axis=1
                    )
                    ignored = np.concatenate(
                        [e["dt_ignore"][:, :max_det] for e in evals], axis=1
                    )
                    order = np.argsort(-scores, kind="mergesort")
                    matched = matched[:, order]
                    ignored = ignored[:, order]
                    for ti in range(t):
                        keep = ~ignored[ti]
                        tp = np.cumsum(matched[ti][keep])
                        fp = np.cumsum(~matched[ti][keep])
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                        recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                        # precision envelope + 101-point interpolation
                        for i in range(nd - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(len(REC_THRS))
                        for ri, pi in enumerate(inds):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[ti, :, ki, ai, mi] = q

        self.precision = precision
        self.recall = recall
        stats = self._summarize(None)
        res = {
            "AP": stats[0], "AP50": stats[1], "AP75": stats[2],
            "APs": stats[3], "APm": stats[4], "APl": stats[5],
            "AR1": stats[6], "AR10": stats[7], "AR100": stats[8],
            "ARs": stats[9], "ARm": stats[10], "ARl": stats[11],
        }
        if self.novel_ids:
            novel_stats = self._summarize(self.novel_ids)
            res["novel_mean"] = novel_stats[1]  # AP50 over novel (ref :339)
            res["novel_AP"] = novel_stats[0]
        return {self.iou_type: res}

    def _summarize(self, class_ids: Optional[Sequence[int]]) -> np.ndarray:
        sel = slice(None) if class_ids is None else list(class_ids)

        def ap(iou_thr=None, area="all", max_det=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(max_det)
            s = self.precision[:, :, sel, ai, mi]
            if iou_thr is not None:
                ti = int(np.argmin(np.abs(IOU_THRS - iou_thr)))
                s = s[ti: ti + 1]
            s = s[s > -1]
            return float(np.mean(s)) * 100 if s.size else -1.0

        def ar(area="all", max_det=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(max_det)
            s = self.recall[:, sel, ai, mi]
            s = s[s > -1]
            return float(np.mean(s)) * 100 if s.size else -1.0

        return np.asarray([
            ap(), ap(0.5), ap(0.75), ap(area="small"), ap(area="medium"),
            ap(area="large"), ar(max_det=1), ar(max_det=10), ar(max_det=100),
            ar(area="small"), ar(area="medium"), ar(area="large"),
        ])
