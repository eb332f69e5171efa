"""Host-side data loaders: strong query stream, weak classifier stream, support.

Replaces the reference's torch DataLoader plumbing (/root/reference/data/build.py)
with simple seeded numpy iterators that emit fixed-shape batches ready for device
transfer.  The weak classifier stream reproduces ``build_classification_train_loader``
including the seeded per-class k-shot sampling with base/novel multipliers and
oversampling modes (build.py:356-438).  Prefetching to device overlaps host IO with
TPU compute (replaces worker processes).
"""

from __future__ import annotations

import itertools
import threading
import queue as queue_lib
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .catalog import DatasetCatalog
from .transforms import TransformConfig, collate, prepare_detection_record

_STRONG_KEYS = ("image", "image_size", "gt_boxes", "gt_classes", "gt_valid")
_WEAK_KEYS = ("image", "image_size", "labels")


def sample_classifier_dataset(cfg, records: List[dict]) -> List[dict]:
    """Seeded k-shot image-level sampling (build.py:356-438).

    Each (image, class) pair becomes a record whose annotations carry only that
    class; base classes keep all records (or sample_num * BASE_MULTIPLIER),
    novel classes are subsampled to WEAK_CLASSIFIER_SAMPLE_NUM (optionally
    repeated/oversampled).
    """
    sample_num = cfg.DATASETS.WEAK_CLASSIFIER_SAMPLE_NUM
    if sample_num <= 0:
        return records
    rng = np.random.RandomState(cfg.DATASETS.SAMPLE_SEED)
    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    base_ids = set(cfg.DATASETS.FEWSHOT.BASE_CLASSES_ID)

    label_to_records: Dict[int, List[dict]] = {c: [] for c in range(num_classes)}
    for rec in records:
        seen = {}
        for ann in rec["annotations"]:
            cid = ann["category_id"]
            if cid not in seen:
                r = dict(rec)
                r["annotations"] = [ann]
                seen[cid] = r
            else:
                seen[cid]["annotations"].append(ann)
        for cid, r in seen.items():
            if cid in label_to_records:
                label_to_records[cid].append(r)

    def choice(pool, size, replace):
        idx = rng.choice(len(pool), size=size, replace=replace)
        return [pool[i] for i in idx]

    out: List[dict] = []
    for cid, pool in label_to_records.items():
        if not pool:
            continue
        if cid in base_ids:
            if not cfg.DATASETS.OVER_SAMPLE and cfg.DATASETS.BASE_MULTIPLIER > 0:
                size = int(sample_num * cfg.DATASETS.BASE_MULTIPLIER)
                sampled = choice(pool, size, replace=size > len(pool))
            else:
                sampled = pool
        else:
            if not cfg.DATASETS.OVER_SAMPLE:
                if cfg.DATASETS.BASE_MULTIPLIER > 0:
                    sampled = choice(pool, sample_num, replace=sample_num > len(pool))
                    if cfg.DATASETS.NOVEL_MULTIPLER > 0:
                        sampled = [
                            r for r in sampled for _ in range(int(cfg.DATASETS.NOVEL_MULTIPLER))
                        ]
                else:
                    sampled = []
            else:
                k = choice(pool, min(sample_num, len(pool)), replace=False)
                if not cfg.DATASETS.SAMPLE_WITH_REPLACEMENT:
                    sampled = choice(k, len(pool), replace=True)
                else:
                    reps, rem = divmod(len(pool), len(k))
                    sampled = list(
                        itertools.chain.from_iterable([r] * reps for r in k)
                    )
                    if rem:
                        sampled += choice(k, rem, replace=True)
        out.extend(sampled)
    return out


class StreamLoader:
    """Infinite shuffled iterator over records -> fixed-shape batches."""

    def __init__(
        self,
        records: List[dict],
        tcfg: TransformConfig,
        batch_size: int,
        keys: Sequence[str],
        seed: int = 0,
        training: bool = True,
        image_loader: Optional[Callable[[dict], np.ndarray]] = None,
    ):
        assert records, "empty dataset"
        self.records = records
        self.tcfg = tcfg
        self.batch_size = batch_size
        self.keys = keys
        self.rng = np.random.RandomState(seed)
        self.training = training
        self.image_loader = image_loader

    def _load(self, rec):
        img = self.image_loader(rec) if self.image_loader else None
        return prepare_detection_record(rec, self.tcfg, self.rng, image=img,
                                        training=self.training)

    def __iter__(self) -> Iterator[dict]:
        order = []
        while True:
            if len(order) < self.batch_size:
                order += list(self.rng.permutation(len(self.records)))
            take, order = order[: self.batch_size], order[self.batch_size:]
            yield collate([self._load(self.records[i]) for i in take], self.keys)


def build_strong_loader(cfg, dataset_names=None, seed=0, image_loader=None,
                        batch_size=None) -> StreamLoader:
    names = dataset_names or cfg.DATASETS.TRAIN
    records = list(itertools.chain.from_iterable(DatasetCatalog.get(n) for n in names))
    return StreamLoader(
        records, TransformConfig.train_from_cfg(cfg),
        batch_size or cfg.SOLVER.IMS_PER_BATCH, _STRONG_KEYS, seed=seed,
        image_loader=image_loader,
    )


def build_classifier_loader(cfg, seed=1, image_loader=None, batch_size=None) -> StreamLoader:
    names = cfg.DATASETS.CLASSIFIER_TRAIN
    if isinstance(names, str):
        names = (names,)
    records = list(itertools.chain.from_iterable(DatasetCatalog.get(n) for n in names))
    records = sample_classifier_dataset(cfg, records)
    return StreamLoader(
        records, TransformConfig.train_from_cfg(cfg),
        batch_size or cfg.SOLVER.IMS_PER_BATCH, _WEAK_KEYS, seed=seed,
        image_loader=image_loader,
    )


def build_test_loader(cfg, dataset_name: str, image_loader=None, batch_size=1):
    """Finite iterator over a test dataset; yields per-batch dicts plus metadata
    (image_id, scale, orig_size) for the evaluator."""
    records = DatasetCatalog.get(dataset_name)
    tcfg = TransformConfig.test_from_cfg(cfg)
    rng = np.random.RandomState(0)

    def gen():
        batch = []
        for rec in records:
            img = image_loader(rec) if image_loader else None
            batch.append(
                prepare_detection_record(rec, tcfg, rng, image=img, training=False)
            )
            if len(batch) == batch_size:
                yield _finalize_test_batch(batch)
                batch = []
        if batch:
            while len(batch) < batch_size:  # pad the final partial batch
                pad = {k: np.copy(v) for k, v in batch[-1].items()}
                pad["image_id"] = None
                batch.append(pad)
            yield _finalize_test_batch(batch)

    return gen(), len(records)


def _finalize_test_batch(batch):
    out = collate(batch, ("image", "image_size"))
    out["image_id"] = [s["image_id"] for s in batch]
    out["scale"] = np.asarray([s["scale"] for s in batch])
    out["orig_size"] = np.stack([s["orig_size"] for s in batch])
    out["gt_boxes"] = np.stack([s["gt_boxes"] for s in batch])
    out["gt_classes"] = np.stack([s["gt_classes"] for s in batch])
    out["gt_valid"] = np.stack([s["gt_valid"] for s in batch])
    return out


class Prefetcher:
    """Background-thread prefetch of an iterator (replaces DataLoader workers)."""

    def __init__(self, it: Iterator, depth: int = 2):
        self.it = it
        self.q: queue_lib.Queue = queue_lib.Queue(maxsize=depth)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        for item in self.it:
            self.q.put(item)
        self.q.put(StopIteration)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is StopIteration:
            raise StopIteration
        return item
