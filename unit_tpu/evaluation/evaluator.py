"""Inference driver: run a model over a test loader and feed an evaluator.

Rebuild of /root/reference/evalutation/evaulator.py ``inference_on_dataset``
(:22-106): warmup-aware timing, ETA logging, evaluator process/evaluate protocol.
Detections come back as padded arrays; boxes are rescaled from network-input to
original image coordinates here (the reference's ``_postprocess``, rcnn.py:411-429).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Iterator, Optional

import jax
import numpy as np

logger = logging.getLogger("unit_tpu")


def inference_on_dataset(
    predict_fn: Callable,          # (images, image_sizes) -> Detections (batched)
    loader: Iterator,              # yields test batches from build_test_loader
    evaluator,                     # PascalVOCEvaluator-like
    total_images: Optional[int] = None,
    warmup: int = 1,
) -> dict:
    # NOTE: no evaluator.reset() here — callers (engine/runner.py eval_fn) feed
    # GT records before handing the evaluator over; resetting would silently
    # wipe them and score AP=0
    num_done = 0
    t_start = None
    timed_base = 0
    total_time = 0.0

    def dispatch(batch):
        if "proposals" in batch:
            # PrecomputedProposals path: test loader attached MCG-style boxes
            return predict_fn(
                batch["image"], batch["image_size"],
                batch["proposals"], batch["proposals_valid"],
            )
        return predict_fn(batch["image"], batch["image_size"])

    def collect(batch, det):
        # one batched host transfer for all output fields (per-field np.asarray
        # pays one device round-trip each — costly on remote-attached TPUs)
        nonlocal num_done
        boxes, scores, classes, valid, masks = jax.device_get(
            (det.boxes, det.scores, det.classes, det.valid, det.masks)
        )
        for i, image_id in enumerate(batch["image_id"]):
            if image_id is None:  # padding of the final partial batch
                continue
            scale = batch["scale"][i]
            oh, ow = batch["orig_size"][i]
            b = boxes[i] / scale
            b[:, 0::2] = np.clip(b[:, 0::2], 0, ow)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, oh)
            if masks is not None:
                evaluator.process(image_id, b, scores[i], classes[i], valid[i],
                                  masks=masks[i])
            else:
                evaluator.process(image_id, b, scores[i], classes[i], valid[i])
            num_done += 1

    # One batch stays IN FLIGHT: dispatch batch k+1 before fetching batch k's
    # results, so the device computes while the host pays the (remote-tunnel)
    # dispatch/fetch round trip and runs the evaluator — measured ~2x on
    # batch-1 eval through axon (0.076 -> device-bound s/img).
    pending = None
    if warmup <= 0:  # no warmup exclusion: time everything, compile included
        t_start = time.perf_counter()
    for batch_idx, batch in enumerate(loader):
        det = dispatch(batch)
        if pending is not None:
            collect(*pending)
            if batch_idx == warmup:
                # clock starts after the warmup batch (its collect absorbed
                # the predict compile)
                t_start = time.perf_counter()
                timed_base = num_done
        pending = (batch, det)
        if total_images and batch_idx % 50 == 0 and t_start is not None:
            total_time = time.perf_counter() - t_start
            per_img = total_time / max(num_done - timed_base, 1)
            eta = per_img * (total_images - num_done)
            logger.info(
                "inference %d/%d (%.4f s/img, ETA %.0fs)",
                num_done, total_images, per_img, eta,
            )
    if pending is not None:
        collect(*pending)
    if t_start is not None:
        total_time = time.perf_counter() - t_start
    if jax.process_count() > 1:
        # every host ran its loader shard; fold the other hosts' accumulated
        # predictions/GT in before scoring (reference: comm.gather to rank 0,
        # data/evaluators.py:159-166 — here every host computes the metrics)
        from ..parallel.comm import gather_objects

        me = jax.process_index()
        for idx, other in enumerate(gather_objects(evaluator)):
            if idx != me:
                evaluator.merge_from(other)
    results = evaluator.evaluate()
    if t_start is not None and num_done > timed_base:
        results["inference_seconds_per_image"] = total_time / (num_done - timed_base)
    return results


def inference_on_dataset_meta(
    predict_fn: Callable,          # (att_vecs_support, images, image_sizes, ...) -> Detections
    loader: Iterator,
    att_vecs_support,              # precomputed support prototypes (compute_meta_attention)
    evaluator,
    total_images: Optional[int] = None,
    warmup: int = 1,
) -> dict:
    """Meta-model eval driver (reference ``data/utils.py:98-172``).

    The reference precomputes the support attention vectors once
    (``model(support_data, return_attention=True)``, engine/defaults.py) and
    passes them to every inference call as ``model(inputs, att_vecs_support)``.
    PARITY QUIRK: inside the reference's meta ROI heads the attention-driven
    visual-similarity branch is commented out at inference
    (``roi_heads.py:386-389``); the live code derives visual similarity from
    the weak detector's own evaluation posteriors, so ``att_vecs_support`` is
    threaded but semantically dead — results are invariant to it.  We keep the
    driver surface (attention bound as the model call's extra argument) and pin
    the invariance in ``tests/test_meta_eval_driver.py``.

    Unlike the reference's sequential loop with a separate "pure compute time"
    (cuda-synchronized per call), this delegates to :func:`inference_on_dataset`
    and keeps its one-batch-in-flight pipelining; the single reported
    ``inference_seconds_per_image`` corresponds to the reference's total-time
    figure.
    """
    def bound(images, image_sizes, *rest):
        return predict_fn(att_vecs_support, images, image_sizes, *rest)

    return inference_on_dataset(bound, loader, evaluator, total_images, warmup)
