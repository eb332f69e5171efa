#!/usr/bin/env python
"""Real-pipeline smoke training on the TPU chip with synthetic data.

Exercises the production path end-to-end on hardware: dataset registration ->
AR-bucketed loaders -> build_optimizer (freeze masks, LR schedule) -> TrainerNoMeta
jitted step -> a small evaluation — everything the VOC recipe would run, minus real
JPEGs (synthetic records + random images).  Usage:
    python scripts/smoke_train_tpu.py [--steps 5] [--depth 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_records(n, h=500, w=700, num_classes=20, seed=0):
    rng = np.random.RandomState(seed)
    recs = []
    for i in range(n):
        # base classes only: base training masks novel logits to -inf, so novel
        # GT would (correctly) produce astronomical CE loss
        base_ids = [0, 1, 3, 4, 6, 7, 8, 10, 11, 12, 14]
        anns = []
        for _ in range(rng.randint(1, 6)):
            x1, y1 = rng.randint(0, w - 120), rng.randint(0, h - 120)
            bw, bh = rng.randint(40, 120), rng.randint(40, 120)
            anns.append({
                "category_id": int(base_ids[rng.randint(len(base_ids))]),
                "bbox": [float(x1), float(y1), float(x1 + bw), float(y1 + bh)],
            })
        recs.append({
            "image_id": f"synth_{i}", "height": h, "width": w, "annotations": anns,
        })
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from unit_tpu.config import get_cfg
    from unit_tpu.data import DatasetCatalog, MetadataCatalog
    from unit_tpu.data.loader import build_classifier_loader, build_strong_loader
    from unit_tpu.engine import TrainerNoMeta, make_predict_fn
    from unit_tpu.models import ModelConfig, WSRCNN
    from unit_tpu.models.similarity import VOC_CLASSES
    from unit_tpu.solver import build_optimizer
    from unit_tpu.engine.train import create_train_state

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = args.depth
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.MODEL.ROI_HEADS.MULTI_BOX_HEAD = True
    cfg.MODEL.ROI_HEADS.FAST_RCNN.WEAK_DETECTOR.DETECTOR_TEMP = 2.0
    cfg.DATASETS.TRAIN = ("synth_train",)
    cfg.DATASETS.CLASSIFIER_TRAIN = ("synth_weak",)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.INPUT.MIN_SIZE_TRAIN = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)
    cfg.TPU.MAX_GT_BOXES = 8

    DatasetCatalog.register("synth_train", lambda: synthetic_records(64, seed=0),
                            overwrite="synth_train" in DatasetCatalog)
    DatasetCatalog.register("synth_weak", lambda: synthetic_records(64, seed=1),
                            overwrite="synth_weak" in DatasetCatalog)
    for n in ("synth_train", "synth_weak"):
        MetadataCatalog.get(n).set(thing_classes=list(VOC_CLASSES),
                                   evaluator_type="pascal_voc")

    def fake_loader(rec):
        rng = np.random.RandomState(abs(hash(rec["image_id"])) % 2**31)
        return rng.rand(rec["height"], rec["width"], 3).astype(np.float32) * 255

    mc = ModelConfig.from_cfg(cfg)
    model = WSRCNN(mc=mc)
    import optax

    tmp = create_train_state(model, optax.sgd(0.0), jax.random.PRNGKey(0))
    optimizer = build_optimizer(cfg, tmp.params)

    from unit_tpu.data.loader import Prefetcher

    trainer = TrainerNoMeta(
        model, optimizer,
        strong_iter=Prefetcher(iter(build_strong_loader(cfg, image_loader=fake_loader)), depth=3),
        weak_iter=Prefetcher(iter(build_classifier_loader(cfg, image_loader=fake_loader)), depth=3),
    )
    trainer.init_state()
    print("state initialized; stepping...", flush=True)
    for i in range(args.steps):
        t0 = time.perf_counter()
        metrics = trainer.run_step()
        print(f"step {i}: {time.perf_counter() - t0:.1f}s "
              f"total_loss={metrics['total_loss']:.3f} "
              f"loss_cls={metrics.get('loss_cls', float('nan')):.3f}", flush=True)
    print("smoke train ok", flush=True)


if __name__ == "__main__":
    main()
