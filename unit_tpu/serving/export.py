"""Serialized inference artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story beyond torch ``.pth`` files consumed by
the training CLIs; serving-side users re-instantiate the whole Detectron2
model stack.  Here the jitted inference path is exported as a self-contained
StableHLO artifact: weights are baked in as constants, so serving needs the
artifact file only — no model code, no config, no checkpoint layout — and the
program is exactly the compiled train-time predict path (same static canvas,
same Pallas ROIAlign custom calls on TPU).

One program is exported per canvas orientation (the test-time loader buckets
portrait vs landscape, data/transforms.py), plus — when MODEL.LOAD_PROPOSALS
is configured — a precomputed-proposal variant pair.  ``load_exported``
returns a callable that dispatches on the input's canvas shape.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Callable, Dict, Optional, Sequence

import numpy as np

FORMAT_VERSION = 1


def _canvas_orientations(cfg):
    from ..data.transforms import TransformConfig

    t = TransformConfig.test_from_cfg(cfg)
    ch, cw = t.canvas
    lo, hi = min(ch, cw), max(ch, cw)
    if lo == hi:
        return [(lo, hi)]
    return [(lo, hi), (hi, lo)]  # landscape, portrait


def _disabled_checks(jax_export):
    # Pallas kernels lower to the Mosaic custom call, which is not on
    # jax.export's cross-release-stable allowlist; serving artifacts are
    # consumed by the same-release runtime that produced them.
    out = []
    for target in ("tpu_custom_call", "Sharding"):
        try:
            out.append(jax_export.DisabledSafetyCheck.custom_call(target))
        except Exception:
            pass
    return out


def make_flat_predict(model, params, with_proposals: bool = False):
    """Inference closure with baked-in params returning a plain-dict pytree.

    jax.export serializes only standard pytree containers, so the Detections
    dataclass is flattened to a dict here and rebuilt by ExportedPredictor.
    """
    from ..engine.train import make_predict_fn

    predict = make_predict_fn(model, with_proposals=with_proposals)

    def predict_flat(*a):
        det = predict(params, *a)
        out = {"boxes": det.boxes, "scores": det.scores,
               "classes": det.classes, "valid": det.valid}
        if det.masks is not None:
            out["masks"] = det.masks
        return out

    return predict_flat


def export_predict(
    cfg,
    model,
    params,
    path: str,
    class_names: Optional[Sequence[str]] = None,
    with_proposals: Optional[bool] = None,
    batch_size: int = 1,
) -> Dict[str, object]:
    """Export the inference path for every canvas orientation to ``path``.

    ``batch_size > 1`` exports fixed-batch programs for the serving-side
    micro-batcher (server.py): the service pads every request group to this
    batch, so each orientation still runs exactly one compiled program.

    Returns the artifact's metadata dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    if with_proposals is None:
        with_proposals = bool(
            cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST
        )
    if getattr(cfg.TPU, "FOLD_BN_AT_EVAL", False):
        # exported programs are forward-only: fold FrozenBN into the conv
        # kernels once so every serving call skips the epilogue multiplies
        from ..utils.bn_fold import fold_frozen_bn

        params = fold_frozen_bn(params)
    predict_flat = make_flat_predict(model, params, with_proposals)
    checks = _disabled_checks(jax_export)

    blobs = {}
    b = int(batch_size)
    prop_capacity = int(cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST or 128)
    for (ch, cw) in _canvas_orientations(cfg):
        args = [
            jax.ShapeDtypeStruct((b, ch, cw, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 2), jnp.float32),
        ]
        if with_proposals:
            args += [
                jax.ShapeDtypeStruct((b, prop_capacity, 4), jnp.float32),
                jax.ShapeDtypeStruct((b, prop_capacity), jnp.bool_),
            ]
        exp = jax_export.export(jax.jit(predict_flat), disabled_checks=checks)(*args)
        blobs[f"{ch}x{cw}"] = exp.serialize()

    import jax as _jax

    meta = {
        "format_version": FORMAT_VERSION,
        "platforms": [_jax.default_backend()],
        "jax_version": _jax.__version__,
        "min_size_test": int(cfg.INPUT.MIN_SIZE_TEST),
        "max_size_test": int(cfg.INPUT.MAX_SIZE_TEST),
        "canvases": sorted(blobs),
        "num_classes": int(cfg.MODEL.ROI_HEADS.NUM_CLASSES),
        "class_names": list(class_names) if class_names else None,
        "with_proposals": bool(with_proposals),
        "batch_size": b,
        "proposal_capacity": prop_capacity if with_proposals else 0,
        "size_divisibility": int(cfg.TPU.SIZE_DIVISIBILITY),
        "max_gt": int(cfg.TPU.MAX_GT_BOXES),
    }
    payload = {"meta": meta, "blobs": blobs}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    return meta


class ExportedPredictor:
    """Loaded artifact: dispatches to the right canvas-orientation program."""

    def __init__(self, meta: dict, fns: Dict[str, Callable]):
        self.meta = meta
        self._fns = fns

    def __call__(self, image, image_size, *extra):
        from ..structures import Detections

        key = f"{image.shape[1]}x{image.shape[2]}"
        fn = self._fns.get(key)
        if fn is None:
            raise ValueError(
                f"no exported program for canvas {key}; artifact has "
                f"{sorted(self._fns)}"
            )
        out = fn(image, image_size, *extra)
        return Detections(
            boxes=out["boxes"], scores=out["scores"], classes=out["classes"],
            valid=out["valid"], masks=out.get("masks"),
        )


def load_exported(path: str) -> ExportedPredictor:
    from jax import export as jax_export

    with open(path, "rb") as f:
        payload = pickle.load(f)
    meta = payload["meta"]
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported artifact version {meta.get('format_version')}")
    fns = {}
    for key, blob in payload["blobs"].items():
        exp = jax_export.deserialize(blob)
        fns[key] = exp.call
    return ExportedPredictor(meta, fns)


def describe(path: str) -> str:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return json.dumps(payload["meta"], indent=2)
