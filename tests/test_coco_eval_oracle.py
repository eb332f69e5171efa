"""Validate unit_tpu's COCOEvaluator against a pycocotools-faithful oracle.

pycocotools is not installed in this image, so the oracle below is an
independent, structure-faithful transcription of the canonical COCOeval
algorithm (cocoeval.py: computeIoU / evaluateImg / accumulate / summarize),
kept deliberately separate from the production implementation in
unit_tpu/evaluation/coco_eval.py: the production code drops ignored
detections before the cumsum and folds crowd handling into a vectorized IoU,
while the oracle follows pycocotools' exact control flow (ignored detections
occupy rank slots; per-gt crowd denominator; mergesort everywhere).  Agreement
across randomized fixtures (crowds, boundary areas, score ties, multiple
classes/images) to 1e-9 on all 12 stats is the parity evidence the reference's
COCOEvaluatorWeakEvaluator (/root/reference/data/evaluators.py:246-339) gets
from pycocotools itself.
"""

import numpy as np
import pytest

from unit_tpu.evaluation.coco_eval import (
    AREA_RNG,
    COCOEvaluator,
    IOU_THRS,
    MAX_DETS,
    REC_THRS,
    _box_iou_matrix,
)


# --------------------------------------------------------------------------- #
# Oracle: pycocotools.cocoeval.COCOeval transcription (bbox only)
# --------------------------------------------------------------------------- #

def _oracle_iou(d_boxes, g_boxes, iscrowd):
    """maskUtils.iou for xyxy boxes: crowd gt -> denominator = det area."""
    D, G = len(d_boxes), len(g_boxes)
    out = np.zeros((D, G))
    for i in range(D):
        dx1, dy1, dx2, dy2 = d_boxes[i]
        da = max(0.0, dx2 - dx1) * max(0.0, dy2 - dy1)
        for j in range(G):
            gx1, gy1, gx2, gy2 = g_boxes[j]
            ga = max(0.0, gx2 - gx1) * max(0.0, gy2 - gy1)
            iw = min(dx2, gx2) - max(dx1, gx1)
            ih = min(dy2, gy2) - max(dy1, gy1)
            inter = max(iw, 0.0) * max(ih, 0.0)
            den = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / den if den > 0 else 0.0
    return out


def _oracle_evaluate_img(gt, dt, area_rng, ious, maxdet):
    """cocoeval.evaluateImg: returns per-threshold match/ignore arrays."""
    if len(gt) == 0 and len(dt) == 0:
        return None
    for g in gt:
        g["_ignore"] = 1 if (g["iscrowd"] or g["area"] < area_rng[0]
                             or g["area"] > area_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dt = [dt[i] for i in dtind[:maxdet]]
    iscrowd = [int(g["iscrowd"]) for g in gt]
    ious_ = ious[:, gtind] if len(ious) > 0 else ious
    ious_ = ious_[dtind[:maxdet]] if len(ious_) > 0 else ious_

    T, G, D = len(IOU_THRS), len(gt), len(dt)
    gtm = np.zeros((T, G)) - 1
    dtm = np.zeros((T, D)) - 1
    gtIg = np.array([g["_ignore"] for g in gt])
    dtIg = np.zeros((T, D))
    if len(ious_) > 0:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] >= 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    if ious_[dind, gind] < iou:
                        continue
                    iou = ious_[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = m
                gtm[tind, m] = dind
    a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1]
                  for d in dt]).reshape(1, -1)
    dtIg = np.logical_or(dtIg, np.logical_and(dtm == -1, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": np.array([d["score"] for d in dt]),
        "gtIgnore": gtIg,
        "dtIgnore": dtIg,
    }


class OracleCOCOeval:
    def __init__(self, num_classes, novel_ids=()):
        self.K = num_classes
        self.novel_ids = list(novel_ids)
        self.gts = {}   # (img, cls) -> [ {bbox, area, iscrowd} ]
        self.dts = {}   # (img, cls) -> [ {bbox, area, score} ]
        self.imgs = set()

    def add_gt(self, img, cls, bbox, iscrowd=0, area=None):
        x1, y1, x2, y2 = bbox
        self.imgs.add(img)
        self.gts.setdefault((img, cls), []).append({
            "bbox": list(map(float, bbox)), "iscrowd": iscrowd,
            "area": float(area if area is not None else (x2 - x1) * (y2 - y1)),
        })

    def add_dt(self, img, cls, bbox, score):
        x1, y1, x2, y2 = bbox
        self.imgs.add(img)
        self.dts.setdefault((img, cls), []).append({
            "bbox": list(map(float, bbox)), "score": float(score),
            "area": float((x2 - x1) * (y2 - y1)),
        })

    def run(self):
        T, R, K, A, M = (len(IOU_THRS), len(REC_THRS), self.K,
                         len(AREA_RNG), len(MAX_DETS))
        imgs = sorted(self.imgs)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k in range(K):
            # IoUs in ORIGINAL dt order; _oracle_evaluate_img applies the
            # score-sort index itself (pycocotools computes them pre-sorted and
            # skips the reindex — equivalent, one sort total either way)
            ious = {}
            for img in imgs:
                gt = self.gts.get((img, k), [])
                dt = self.dts.get((img, k), [])
                ious[img] = _oracle_iou(
                    [d["bbox"] for d in dt], [g["bbox"] for g in gt],
                    [g["iscrowd"] for g in gt],
                )
            for a_i, rng in enumerate(AREA_RNG.values()):
                evals = [
                    _oracle_evaluate_img(
                        [dict(g) for g in self.gts.get((img, k), [])],
                        [dict(d) for d in self.dts.get((img, k), [])],
                        rng, ious[img], MAX_DETS[-1],
                    )
                    for img in imgs
                ]
                for m_i, maxDet in enumerate(MAX_DETS):
                    E = [e for e in evals if e is not None]
                    if not E:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, :maxDet] for e in E], axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, :maxDet] for e in E], axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm >= 0, np.logical_not(dtIg))
                    fps = np.logical_and(dtm < 0, np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t in range(len(IOU_THRS)):
                        tp, fp = tp_sum[t], fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros(len(REC_THRS))
                        recall[t, k, a_i, m_i] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, REC_THRS, side="left")
                        for ri, pi in enumerate(inds2):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[t, :, k, a_i, m_i] = q
        self.precision, self.recall = precision, recall
        return self._stats(None)

    def _stats(self, sel_ids):
        sel = slice(None) if sel_ids is None else sel_ids

        def _ap(iouThr=None, area="all", maxDet=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(maxDet)
            s = self.precision[:, :, sel, ai, mi]
            if iouThr is not None:
                s = s[np.where(np.isclose(IOU_THRS, iouThr))[0]]
            s = s[s > -1]
            return np.mean(s) * 100 if s.size else -1.0

        def _ar(area="all", maxDet=100):
            ai = list(AREA_RNG).index(area)
            mi = MAX_DETS.index(maxDet)
            s = self.recall[:, sel, ai, mi]
            s = s[s > -1]
            return np.mean(s) * 100 if s.size else -1.0

        return np.array([
            _ap(), _ap(0.5), _ap(0.75), _ap(area="small"), _ap(area="medium"),
            _ap(area="large"), _ar(maxDet=1), _ar(maxDet=10), _ar(maxDet=100),
            _ar(area="small"), _ar(area="medium"), _ar(area="large"),
        ])


# --------------------------------------------------------------------------- #
# Fixture generation + comparison
# --------------------------------------------------------------------------- #

def _random_fixture(seed, n_imgs=12, n_cls=5, crowd_frac=0.15):
    rng = np.random.RandomState(seed)
    gt, dt = [], []
    for img in range(n_imgs):
        for _ in range(rng.randint(1, 6)):
            cls = rng.randint(n_cls)
            # mix of small/medium/large areas (incl. exact boundary 32**2)
            s = rng.choice([8, 20, 32, 60, 150, 400])
            x1, y1 = rng.uniform(0, 500, 2)
            bbox = (x1, y1, x1 + s, y1 + s * rng.uniform(0.8, 1.25))
            crowd = int(rng.rand() < crowd_frac)
            gt.append((f"im{img}", cls, bbox, crowd))
            # detections correlated with GT (jittered) + noise
            for _ in range(rng.randint(0, 3)):
                j = rng.uniform(-0.25 * s, 0.25 * s, 4)
                db = (bbox[0] + j[0], bbox[1] + j[1], bbox[2] + j[2], bbox[3] + j[3])
                # quantized scores to exercise tie-breaking
                dt.append((f"im{img}", cls, db, round(rng.rand(), 1)))
        for _ in range(rng.randint(0, 4)):  # pure false positives
            cls = rng.randint(n_cls)
            x1, y1 = rng.uniform(0, 500, 2)
            s = rng.uniform(10, 200)
            dt.append((f"im{img}", cls, (x1, y1, x1 + s, y1 + s),
                       round(rng.rand(), 1)))
    return gt, dt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coco_eval_matches_pycocotools_oracle(seed):
    n_cls = 5
    gt, dt = _random_fixture(seed, n_cls=n_cls)

    ours = COCOEvaluator([f"c{i}" for i in range(n_cls)], novel_class_ids=(1, 3))
    oracle = OracleCOCOeval(n_cls, novel_ids=(1, 3))
    recs = {}
    for img, cls, bbox, crowd in gt:
        recs.setdefault(img, []).append({
            "category_id": cls, "bbox": list(bbox), "iscrowd": crowd,
            "area": (bbox[2] - bbox[0]) * (bbox[3] - bbox[1]),
        })
        oracle.add_gt(img, cls, bbox, iscrowd=crowd)
    for img, anns in recs.items():
        ours.process_gt_record({"image_id": img, "annotations": anns})
    per_img = {}
    for img, cls, bbox, score in dt:
        per_img.setdefault(img, []).append((cls, bbox, score))
        oracle.add_dt(img, cls, bbox, score)
    for img, items in per_img.items():
        boxes = np.array([b for _, b, _ in items])
        scores = np.array([s for _, _, s in items])
        classes = np.array([c for c, _, _ in items])
        ours.process(img, boxes, scores, classes, np.ones(len(items), bool))

    res = ours.evaluate()["bbox"]
    got = np.array([res["AP"], res["AP50"], res["AP75"], res["APs"], res["APm"],
                    res["APl"], res["AR1"], res["AR10"], res["AR100"],
                    res["ARs"], res["ARm"], res["ARl"]])
    want = oracle.run()
    np.testing.assert_allclose(got, want, atol=1e-9,
                               err_msg=f"stats mismatch (seed {seed})")
    # novel slicing agrees too
    np.testing.assert_allclose(res["novel_mean"], oracle._stats([1, 3])[1],
                               atol=1e-9)


def test_box_iou_matrix_crowd_and_vectorization():
    rng = np.random.RandomState(0)
    d = rng.uniform(0, 100, (7, 2))
    dets = np.concatenate([d, d + rng.uniform(5, 60, (7, 2))], axis=1)
    g = rng.uniform(0, 100, (5, 2))
    gts = np.concatenate([g, g + rng.uniform(5, 60, (5, 2))], axis=1)
    crowd = np.array([0, 1, 0, 1, 0])
    got = _box_iou_matrix(dets, gts, iscrowd=crowd)
    want = _oracle_iou(dets, gts, crowd)
    np.testing.assert_allclose(got, want, atol=1e-12)
