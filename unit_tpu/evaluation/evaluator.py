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
    total_time = 0.0
    for batch_idx, batch in enumerate(loader):
        t0 = time.perf_counter()
        if "proposals" in batch:
            # PrecomputedProposals path: test loader attached MCG-style boxes
            det = predict_fn(
                batch["image"], batch["image_size"],
                batch["proposals"], batch["proposals_valid"],
            )
        else:
            det = predict_fn(batch["image"], batch["image_size"])
        # one batched host transfer for all output fields (per-field np.asarray
        # pays one device round-trip each — costly on remote-attached TPUs)
        boxes, scores, classes, valid, masks = jax.device_get(
            (det.boxes, det.scores, det.classes, det.valid, det.masks)
        )
        dt = time.perf_counter() - t0
        if batch_idx >= warmup:
            total_time += dt

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
        if total_images and batch_idx % 50 == 0 and num_done > warmup:
            per_img = total_time / max(num_done - warmup, 1)
            eta = per_img * (total_images - num_done)
            logger.info(
                "inference %d/%d (%.4f s/img, ETA %.0fs)",
                num_done, total_images, per_img, eta,
            )
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
    if num_done > warmup:
        results["inference_seconds_per_image"] = total_time / (num_done - warmup)
    return results
