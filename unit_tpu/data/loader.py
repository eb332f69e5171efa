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
from .transforms import (
    TransformConfig, collate, oriented_canvas, prepare_detection_record,
)

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
        sync_portrait_frac: Optional[float] = None,
    ):
        assert records, "empty dataset"
        self.records = records
        self.tcfg = tcfg
        self.batch_size = batch_size
        self.keys = keys
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.training = training
        self.image_loader = image_loader
        # Multi-host SPMD: every process must emit the SAME batch shape each
        # step (mesh.shard_batch assembles one global array; mismatched
        # orientations would compile different programs per host and deadlock
        # the collectives).  When set, the batch's canvas orientation is drawn
        # from a schedule shared by all hosts: same seed + same global
        # portrait fraction -> identical orientation sequence everywhere,
        # while each host still samples its own record shard.
        self.sync_portrait_frac = sync_portrait_frac

    def _draw_aug(self):
        """The ONLY rng draws per record (min-size choice + flip coin).  Both
        `_load` and `fast_forward` consume this exact sequence, so a resumed
        stream replays the same augmentations without decoding anything."""
        t = self.tcfg
        min_size = (
            t.min_sizes[self.rng.randint(len(t.min_sizes))]
            if self.training else t.min_sizes[0]
        )
        flip = bool(self.training and t.flip and self.rng.rand() < 0.5)
        return min_size, flip

    def _load(self, rec, aug=None):
        # Draw the augmentation parameters ONCE, up front: the native path
        # and the PIL fallback must consume identical rng draws, or a single
        # undecodable file would shift the augmentation stream of every
        # subsequent record (and de-synchronize multi-host runs where only
        # some hosts have the native library).
        min_size, flip = aug if aug is not None else self._draw_aug()
        if self.image_loader is None and _native_eligible(rec):
            try:
                return self._load_native(rec, min_size, flip)
            except RuntimeError:
                pass  # undecodable file -> PIL fallback
        img = self.image_loader(rec) if self.image_loader else None
        return prepare_detection_record(rec, self.tcfg, self.rng, image=img,
                                        training=self.training,
                                        aug=(min_size, flip))

    def _emit(self, batch):
        out = collate(batch, self.keys)
        if self.tcfg.host_uint8 and "image" in out:
            # Quantize the batch back to the decode wire format: pixels are
            # uint8 before resize, and bilinear-resized values round back with
            # <=0.5 LSB error — for 4x fewer bytes over the host->device link,
            # the throughput wall on remote-attached chips (~40 MB/s through
            # the axon tunnel vs ~10 MB/step at 320 px, BASELINE.md round 5).
            # The model casts to float32 on device (meta_arch.preprocess).
            out["image"] = np.clip(np.rint(out["image"]), 0, 255).astype(np.uint8)
        return out

    def _load_native(self, rec, min_size: int, flip: bool):
        """decode+resize+flip+canvas in the C runtime (GIL-free); only the
        annotation transform stays in Python."""
        from . import native as native_lib

        t = self.tcfg
        h, w = int(rec["height"]), int(rec["width"])
        ch, cw = oriented_canvas(h, w, t.canvas)
        image, (nh, nw), scale = native_lib.prepare_image_native(
            rec["file_name"], min_size, t.max_size, (ch, cw), flip
        )
        return prepare_detection_record(
            rec, t, self.rng, training=self.training,
            preprocessed=(image, nh, nw, scale, flip),
        )

    def __iter__(self) -> Iterator[dict]:
        """Aspect-ratio-grouped batching (d2 AspectRatioGroupedDataset,
        SURVEY.md §2.4): landscape and portrait samples go to separate buckets
        (different fixed canvases -> two compile variants), a batch is emitted
        whenever one bucket fills.  With ``sync_portrait_frac`` set (multi-host
        runs), each batch's orientation instead follows a host-synchronized
        schedule so every process emits the same shape each step."""
        if self.sync_portrait_frac is not None:
            yield from self._iter_synced()
            return
        order: List[int] = []
        buckets: Dict[tuple, List[dict]] = {}
        if getattr(self, "_resume", None) is not None:
            # fast_forward left the stream mid-epoch: records already drawn
            # into partially-filled buckets are decoded NOW with their
            # recorded augmentation draws (at most batch_size-1 per bucket).
            order, bucket_meta = self._resume
            self._resume = None
            buckets = {
                key: [self._load(self.records[i], aug=aug) for i, aug in metas]
                for key, metas in bucket_meta.items()
            }
        while True:
            if not order:
                order = list(self.rng.permutation(len(self.records)))
            sample = self._load(self.records[order.pop()])
            key = sample["image"].shape[:2]
            buckets.setdefault(key, []).append(sample)
            if len(buckets[key]) == self.batch_size:
                batch, buckets[key] = buckets[key], []
                yield self._emit(batch)

    def _iter_synced(self) -> Iterator[dict]:
        """Host-synchronized orientation schedule.  Orientation is known from
        record metadata (height/width) without decoding, so records are picked
        to match the scheduled orientation instead of loaded speculatively."""
        ch, cw = self.tcfg.canvas
        if ch == cw:  # square canvas: every batch has the same shape anyway
            self.sync_portrait_frac = None
            yield from self.__iter__()
            return
        is_portrait = [int(r["height"]) > int(r["width"]) for r in self.records]
        have = {True: any(is_portrait), False: not all(is_portrait)}
        orient_rng = np.random.RandomState((self.seed + 0x5EED) % 2**31)
        order: List[int] = []
        pend: Dict[bool, List[int]] = {True: [], False: []}
        if getattr(self, "_resume_synced", None) is not None:
            orient_rng, order, pend = self._resume_synced
            self._resume_synced = None
        while True:
            want = bool(orient_rng.rand() < self.sync_portrait_frac)
            if not have[want]:
                raise RuntimeError(
                    f"host data shard has no "
                    f"{'portrait' if want else 'landscape'} images but the "
                    f"global dataset does — the synchronized multi-host "
                    f"orientation schedule cannot be satisfied; use more "
                    f"records per host or a square canvas"
                )
            batch = []
            while len(batch) < self.batch_size:
                if pend[want]:
                    batch.append(self._load(self.records[pend[want].pop()]))
                    continue
                if not order:
                    order = list(self.rng.permutation(len(self.records)))
                i = order.pop()
                pend[is_portrait[i]].append(i)
            yield self._emit(batch)

    def fast_forward(self, n_batches: int) -> None:
        """Advance the stream past ``n_batches`` WITHOUT decoding any image.

        Exact-resume support (--resume): replays the index-permutation and
        augmentation rng draws the real iterator would have consumed, then
        pre-positions the next ``__iter__`` so batch ``n_batches`` onward is
        bit-identical to an un-resumed run's.  The reference (a d2-style
        infinite sampler, /root/reference/data/build.py) restarts its stream
        from the beginning on resume and replays early data.
        """
        if n_batches <= 0:
            return
        from .transforms import oriented_canvas

        if self.sync_portrait_frac is not None:
            ch, cw = self.tcfg.canvas
            if ch != cw:
                self._fast_forward_synced(n_batches)
                return
            self.sync_portrait_frac = None  # mirrors _iter_synced's square case
        order: List[int] = []
        buckets: Dict[tuple, List[tuple]] = {}  # key -> [(rec_idx, aug)]
        done = 0
        while done < n_batches:
            if not order:
                order = list(self.rng.permutation(len(self.records)))
            i = order.pop()
            aug = self._draw_aug()
            rec = self.records[i]
            key = oriented_canvas(
                int(rec["height"]), int(rec["width"]), self.tcfg.canvas
            )
            buckets.setdefault(key, []).append((i, aug))
            if len(buckets[key]) == self.batch_size:
                buckets[key] = []
                done += 1
        self._resume = (order, {k: v for k, v in buckets.items() if v})

    def _fast_forward_synced(self, n_batches: int) -> None:
        """`fast_forward` for the host-synchronized orientation schedule:
        replays the orientation draws + record pops of `_iter_synced` (aug
        draws happen at batch-assembly time there, so the leftover `pend`
        lists carry no aug state and nothing needs decoding)."""
        is_portrait = [int(r["height"]) > int(r["width"]) for r in self.records]
        have = {True: any(is_portrait), False: not all(is_portrait)}
        orient_rng = np.random.RandomState((self.seed + 0x5EED) % 2**31)
        order: List[int] = []
        pend: Dict[bool, List[int]] = {True: [], False: []}
        for _ in range(n_batches):
            want = bool(orient_rng.rand() < self.sync_portrait_frac)
            if not have[want]:
                raise RuntimeError(
                    "host data shard cannot satisfy the synchronized "
                    "orientation schedule (see _iter_synced)"
                )
            n = 0
            while n < self.batch_size:
                if pend[want]:
                    pend[want].pop()
                    self._draw_aug()
                    n += 1
                    continue
                if not order:
                    order = list(self.rng.permutation(len(self.records)))
                i = order.pop()
                pend[is_portrait[i]].append(i)
        self._resume_synced = (orient_rng, order, pend)


def _host_shard(records):
    """Multi-host data parallelism: each process owns a disjoint slice of the
    dataset (replaces the reference's per-rank DistributedSampler)."""
    import jax

    if jax.process_count() > 1:
        return records[jax.process_index()::jax.process_count()]
    return records


def _sync_portrait_frac(records):
    """Global portrait fraction for the host-synchronized orientation
    schedule (StreamLoader._iter_synced).  Must be computed on the FULL
    record list BEFORE _host_shard so every process derives the same value;
    returns None single-process (plain aspect-ratio bucketing applies)."""
    import jax

    if jax.process_count() <= 1:
        return None
    n = sum(1 for r in records if int(r["height"]) > int(r["width"]))
    return n / max(len(records), 1)


def _per_host_batch(global_batch: int) -> int:
    """IMS_PER_BATCH is the GLOBAL batch (reference semantics: split across
    workers, data/build.py:110-122); each host loads its share and
    ``parallel.mesh.shard_batch`` assembles the global array."""
    import jax

    pc = jax.process_count()
    if pc > 1:
        assert global_batch % pc == 0, (
            f"SOLVER.IMS_PER_BATCH={global_batch} not divisible by "
            f"{pc} processes"
        )
        return global_batch // pc
    return global_batch


def build_strong_loader(cfg, dataset_names=None, seed=0, image_loader=None,
                        batch_size=None) -> StreamLoader:
    names = dataset_names or cfg.DATASETS.TRAIN
    records = list(itertools.chain.from_iterable(DatasetCatalog.get(n) for n in names))
    sync_frac = _sync_portrait_frac(records)
    records = _host_shard(records)
    keys = _STRONG_KEYS + (("gt_masks",) if cfg.MODEL.MASK_ON else ())
    tcfg = TransformConfig.train_from_cfg(cfg)
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TRAIN:
        # PrecomputedProposals strong stream (dock suite): proposals replace
        # the RPN for the supervised batch too (ref PROPOSAL_GENERATOR:
        # "PrecomputedProposals", COCO-VGG-CNN-F-split1-dock.yaml)
        from .proposals import attach_proposals

        attach_proposals(
            records, cfg.DATASETS.PROPOSAL_FILES_TRAIN,
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN,
        )
        tcfg.proposal_capacity = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
        keys = keys + ("proposals", "proposals_valid")
    return StreamLoader(
        records, tcfg,
        batch_size or _per_host_batch(cfg.SOLVER.IMS_PER_BATCH), keys, seed=seed,
        image_loader=image_loader, sync_portrait_frac=sync_frac,
    )


def build_classifier_loader(cfg, seed=1, image_loader=None, batch_size=None) -> StreamLoader:
    names = cfg.DATASETS.CLASSIFIER_TRAIN
    if isinstance(names, str):
        names = (names,)
    records = list(itertools.chain.from_iterable(DatasetCatalog.get(n) for n in names))
    records = sample_classifier_dataset(cfg, records)
    sync_frac = _sync_portrait_frac(records)
    records = _host_shard(records)
    tcfg = TransformConfig.train_from_cfg(cfg)
    keys = _WEAK_KEYS
    if cfg.MODEL.LOAD_PROPOSALS:
        from .proposals import attach_proposals

        attach_proposals(
            records, cfg.DATASETS.PROPOSAL_FILES_CLASSIFIER_TRAIN,
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN,
        )
        tcfg.proposal_capacity = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
        keys = keys + ("proposals", "proposals_valid")
    return StreamLoader(
        records, tcfg,
        batch_size or _per_host_batch(cfg.SOLVER.IMS_PER_BATCH), keys, seed=seed,
        image_loader=image_loader, sync_portrait_frac=sync_frac,
    )


def build_classifier_strong_loader(cfg, seed=0, image_loader=None,
                                   batch_size=None) -> StreamLoader:
    """Classifier datasets served as a BOXED supervised stream — the
    ``TrainerOnlyWeakFineTune`` path (ref engine/defaults.py:402-425), where
    ``classifier_data`` (image-level sampled but carrying its box annotations)
    is fed to the model as the supervised batch."""
    names = cfg.DATASETS.CLASSIFIER_TRAIN
    if isinstance(names, str):
        names = (names,)
    records = list(itertools.chain.from_iterable(DatasetCatalog.get(n) for n in names))
    records = sample_classifier_dataset(cfg, records)
    records = [r for r in records if r.get("annotations")]
    sync_frac = _sync_portrait_frac(records)
    records = _host_shard(records)
    keys = _STRONG_KEYS + (("gt_masks",) if cfg.MODEL.MASK_ON else ())
    return StreamLoader(
        records, TransformConfig.train_from_cfg(cfg),
        batch_size or _per_host_batch(cfg.SOLVER.IMS_PER_BATCH), keys, seed=seed,
        image_loader=image_loader, sync_portrait_frac=sync_frac,
    )


def build_test_loader(cfg, dataset_name: str, image_loader=None, batch_size=1):
    """Finite iterator over a test dataset; yields per-batch dicts plus metadata
    (image_id, scale, orig_size) for the evaluator.

    Host input pipeline: when the native C++ decoder (native/dataloader.cc via
    data/native.py) is available and records point at JPEG files, decode +
    resize + canvas-fill run in C with the GIL released — the replacement for
    the reference's torch DataLoader workers (/root/reference/data/build.py:87-93).
    The returned iterator is wrapped in a background Prefetcher so host prep
    overlaps device compute (eval was measured host-bound at ~2x device time
    in round 2 without it).

    Multi-process: each host evaluates a disjoint record slice (the reference's
    InferenceSampler split, merged back by comm.gather/evaluator merge_from);
    callers feeding GT must feed the same slice (engine/runner.py eval_fn)."""
    records = _host_shard(DatasetCatalog.get(dataset_name))
    tcfg = TransformConfig.test_from_cfg(cfg)
    extra_keys = ()
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST:
        from .proposals import attach_proposals

        attach_proposals(
            records, cfg.DATASETS.PROPOSAL_FILES_TEST,
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST,
        )
        tcfg.proposal_capacity = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        extra_keys = ("proposals", "proposals_valid")
    rng = np.random.RandomState(0)
    load_one = _make_test_record_loader(tcfg, rng, image_loader, records)

    def gen():
        batch = []
        for rec in records:
            batch.append(load_one(rec))
            if len(batch) == batch_size:
                yield _finalize_test_batch(batch, extra_keys)
                batch = []
        if batch:
            while len(batch) < batch_size:  # pad the final partial batch
                pad = {k: np.copy(v) for k, v in batch[-1].items()}
                pad["image_id"] = None
                batch.append(pad)
            yield _finalize_test_batch(batch, extra_keys)

    return Prefetcher(gen(), depth=4), len(records)


def _native_eligible(rec) -> bool:
    from . import native as native_lib

    return (
        str(rec.get("file_name", "")).lower().endswith((".jpg", ".jpeg"))
        and "height" in rec and "width" in rec
        and native_lib.available()
    )


def _make_test_record_loader(tcfg, rng, image_loader, records):
    """record -> prepared sample, preferring the native C decode path."""
    from . import native as native_lib

    def load_one(rec):
        if image_loader is None and _native_eligible(rec):
            h, w = int(rec["height"]), int(rec["width"])
            ch, cw = oriented_canvas(h, w, tcfg.canvas)
            try:
                image, (nh, nw), scale = native_lib.prepare_image_native(
                    rec["file_name"], tcfg.min_sizes[0], tcfg.max_size, (ch, cw)
                )
                return prepare_detection_record(
                    rec, tcfg, rng, training=False,
                    preprocessed=(image, nh, nw, scale),
                )
            except RuntimeError:
                pass  # undecodable (e.g. non-JPEG bytes) -> PIL fallback
        img = image_loader(rec) if image_loader else None
        return prepare_detection_record(rec, tcfg, rng, image=img, training=False)

    return load_one


def _finalize_test_batch(batch, extra_keys=()):
    out = collate(batch, ("image", "image_size") + tuple(extra_keys))
    out["image_id"] = [s["image_id"] for s in batch]
    out["scale"] = np.asarray([s["scale"] for s in batch])
    out["orig_size"] = np.stack([s["orig_size"] for s in batch])
    out["gt_boxes"] = np.stack([s["gt_boxes"] for s in batch])
    out["gt_classes"] = np.stack([s["gt_classes"] for s in batch])
    out["gt_valid"] = np.stack([s["gt_valid"] for s in batch])
    return out


def build_tta_test_loader(cfg, dataset_name: str, image_loader=None):
    """Test loader for TTA inference (TEST.AUG): per image, yields the canonical
    batch plus one resized(+flipped) variant per TEST.AUG.MIN_SIZES entry
    (WeakRCNN tta_fn semantics, rcnn.py:44-83).  Batch size is fixed at 1, as in
    the reference's TTA path (rcnn.py:136)."""
    from .transforms import (
        TransformConfig, max_aspect_of, prepare_detection_record, tta_canvas_for,
    )

    records = _host_shard(DatasetCatalog.get(dataset_name))
    # Tight per-scale variant canvases (round-5 TTA lever): the long side is
    # bounded by min_size * the dataset's max aspect ratio, not the global
    # TEST.AUG.MAX_SIZE — identical content + local-conv zero padding, far
    # fewer dead backbone pixels (480x2000 -> 480x832 on VOC-like aspects).
    max_aspect = max_aspect_of(records)
    base_t = TransformConfig.test_from_cfg(cfg)
    use_proposals = bool(cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST)
    if use_proposals:
        # PrecomputedProposals under TTA: proposals ride the CANONICAL frame
        # only — predict_tta rescales/flips them into each variant's frame
        # in-graph, matching the reference's per-variant proposal transforms
        # (rcnn.py:47-83)
        from .proposals import attach_proposals

        attach_proposals(
            records, cfg.DATASETS.PROPOSAL_FILES_TEST,
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST,
        )
        base_t.proposal_capacity = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
    variant_cfgs = []
    for ms in cfg.TEST.AUG.MIN_SIZES:
        t = TransformConfig(
            min_sizes=(ms,), max_size=cfg.TEST.AUG.MAX_SIZE,
            canvas=tta_canvas_for(ms, cfg.TEST.AUG.MAX_SIZE,
                                  cfg.TPU.SIZE_DIVISIBILITY, max_aspect),
            flip=False, max_gt=base_t.max_gt, num_classes=base_t.num_classes,
        )
        variant_cfgs.append((t, False))
        if cfg.TEST.AUG.FLIP:
            variant_cfgs.append((t, True))
    rng = np.random.RandomState(0)

    def gen():
        for rec in records:
            from .transforms import load_image_bgr

            img = image_loader(rec) if image_loader else load_image_bgr(rec["file_name"])
            canonical = prepare_detection_record(rec, base_t, rng, image=img,
                                                 training=False)
            variants = []
            for t, flip in variant_cfgs:
                v = prepare_detection_record(rec, t, rng, image=img, training=False)
                vimg = v["image"]
                if flip:
                    nh, nw = int(v["image_size"][0]), int(v["image_size"][1])
                    vimg = vimg.copy()
                    vimg[:nh, :nw] = vimg[:nh, :nw][:, ::-1]
                variants.append({
                    "image": vimg[None],
                    "image_size": v["image_size"][None],
                    "scale": float(v["scale"] / canonical["scale"]),
                    "flip": flip,
                })
            out = {
                "image": canonical["image"][None],
                "image_size": canonical["image_size"][None],
                "image_id": [canonical["image_id"]],
                "scale": np.asarray([canonical["scale"]]),
                "orig_size": canonical["orig_size"][None],
                "variants": variants,
            }
            if use_proposals:
                out["proposals"] = canonical["proposals"][None]
                out["proposals_valid"] = canonical["proposals_valid"][None]
            yield out

    # background prefetch: the multi-variant host prep is heavy, overlap it
    # with the device's TTA forward
    return Prefetcher(gen(), depth=2), len(records)


class SupportLoader:
    """Per-class k-shot support stream (SupportExamplesSampler +
    MapSupportDataset, /root/reference/data/common.py:11-84).

    Train mode: infinite random k shots per class each step; eval mode:
    deterministic chunked sampling (common.py:43-56).  Yields
    {image [C, K, h, w, 3], boxes [C, K, 4], class_valid [C]} — each shot
    contributes its first GT box of that class, resized to the meta canvas
    (MetaDatasetMapper semantics, data/dataset_mapper.py:12-30).
    """

    def __init__(
        self,
        records_by_class: dict,
        class_ids: Sequence[int],
        shots: int,
        meta_size: int = 224,
        seed: int = 0,
        deterministic: bool = False,
        image_loader: Optional[Callable[[dict], np.ndarray]] = None,
    ):
        self.by_class = records_by_class
        self.class_ids = list(class_ids)
        self.shots = shots
        self.meta_size = meta_size
        self.rng = np.random.RandomState(seed)
        self.deterministic = deterministic
        self.image_loader = image_loader
        self._det_pos = {c: 0 for c in self.class_ids}

    def _prepare_shot(self, rec, class_id):
        from .transforms import load_image_bgr, resize_image

        img = self.image_loader(rec) if self.image_loader else load_image_bgr(rec["file_name"])
        h, w = img.shape[:2]
        m = self.meta_size
        out = resize_image(img.astype(np.float32), m, m)  # square meta resize
        sy, sx = m / h, m / w
        box = None
        for ann in rec["annotations"]:
            if ann["category_id"] == class_id:
                b = ann["bbox"]
                box = np.asarray([b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy], np.float32)
                break
        if box is None:
            box = np.asarray([0, 0, m, m], np.float32)
        return out, box

    def __iter__(self):
        while True:
            yield self.next_batch()

    def fast_forward(self, n_batches: int) -> None:
        """Advance the support stream past ``n_batches`` without loading any
        shot (exact --resume support; see StreamLoader.fast_forward)."""
        for _ in range(max(0, n_batches)):
            for cls in self.class_ids:
                pool = self.by_class.get(cls, [])
                if not pool:
                    continue
                if self.deterministic:
                    self._det_pos[cls] = (self._det_pos[cls] + self.shots) % len(pool)
                else:
                    self.rng.randint(0, len(pool), size=self.shots)

    def next_batch(self):
        c = len(self.class_ids)
        k = self.shots
        m = self.meta_size
        images = np.zeros((c, k, m, m, 3), np.float32)
        boxes = np.zeros((c, k, 4), np.float32)
        valid = np.zeros((c,), bool)
        for ci, cls in enumerate(self.class_ids):
            pool = self.by_class.get(cls, [])
            if not pool:
                continue
            valid[ci] = True
            if self.deterministic:
                start = self._det_pos[cls]
                idxs = [(start + i) % len(pool) for i in range(k)]
                self._det_pos[cls] = (start + k) % len(pool)
            else:
                idxs = self.rng.randint(0, len(pool), size=k)
            for ki, idx in enumerate(idxs):
                images[ci, ki], boxes[ci, ki] = self._prepare_shot(pool[idx], cls)
        return {"image": images, "boxes": boxes, "class_valid": valid}


def build_support_loader(cfg, dataset_name: str = "voc_base_training_support",
                         seed=2, deterministic=False, image_loader=None) -> SupportLoader:
    by_class = DatasetCatalog.get(dataset_name)
    return SupportLoader(
        by_class,
        class_ids=list(cfg.DATASETS.FEWSHOT.BASE_CLASSES_ID),
        shots=cfg.DATASETS.BASE_META_SHOTS if deterministic else cfg.DATASETS.FEWSHOT.NUM_SHOTS,
        meta_size=cfg.INPUT.META_MIN_SIZE,
        seed=seed,
        deterministic=deterministic,
        image_loader=image_loader,
    )


class _PrefetchError:
    """Envelope forwarding a producer-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


_PREFETCH_DONE = object()


def _prefetch_worker(it, q, stop, sentinel):
    # Module-level so the thread does NOT hold a reference to the Prefetcher:
    # an abandoned Prefetcher then becomes garbage, its __del__ sets `stop`,
    # and the thread exits instead of reading disk forever.
    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_lib.Full:
                continue
        return False

    try:
        for item in it:
            if not put(item) or stop.is_set():
                return
        put(sentinel)
    except BaseException as e:  # noqa: BLE001 — forwarded, re-raised by consumer
        if not stop.is_set():
            put(_PrefetchError(e))


class Prefetcher:
    """Background-thread prefetch of an iterator (replaces DataLoader workers).

    Closeable: ``close()`` (also via ``with`` or garbage collection) signals the
    producer thread to stop, so abandoned iterators do not leak a thread that
    keeps reading disk.  Producer exceptions are re-raised in the consumer."""

    def __init__(self, it: Iterator, depth: int = 2):
        self.q: queue_lib.Queue = queue_lib.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(
            target=_prefetch_worker, args=(it, self.q, self._stop, _PREFETCH_DONE),
            daemon=True,
        )
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self.q.get()
        if item is _PREFETCH_DONE:
            raise StopIteration
        if isinstance(item, _PrefetchError):
            raise item.exc
        return item

    def close(self, timeout: float = 5.0):
        self._stop.set()
        try:  # drain so a blocked producer unblocks immediately
            while True:
                self.q.get_nowait()
        except queue_lib.Empty:
            pass
        self.thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        # only signal — joining from a finalizer is unsafe
        self._stop.set()
