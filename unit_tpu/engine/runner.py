"""CLI runner utilities: argument parsing, config setup, end-to-end train/eval.

Rebuild of the reference's script skeleton (scripts/train_VOC.py:22-77): build cfg
from YAML + dotted overrides, register datasets, construct the trainer for the
configured meta-architecture, run training with checkpoint/eval hooks, or run
eval-only.  ``--num-gpus`` maps to the number of mesh devices (the launch/DDP
machinery is replaced by single-program SPMD over the jax device mesh).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import jax
import numpy as np

from ..config import get_cfg
from ..checkpoint import (
    Checkpointer,
    PeriodicCheckpointerWithEval,
    load_glove_embeddings,
    load_torch_resnet,
)
from ..data import (
    DatasetCatalog,
    build_classifier_loader,
    build_strong_loader,
    build_test_loader,
    Prefetcher,
)
from ..data.utils import get_evaluator, register_datasets
from ..evaluation import inference_on_dataset
from ..models import ModelConfig, WSRCNN
from ..parallel import make_mesh
from ..solver import build_optimizer
from ..utils.events import MetricsHook
from .train import TrainerFineTune, TrainerNoMeta, TrainerOnlyWeak, make_predict_fn

logger = logging.getLogger("unit_tpu")


def default_argument_parser():
    parser = argparse.ArgumentParser(description="unit_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=1,
                        help="number of mesh devices (name kept for parity)")
    parser.add_argument("--data-root", default=None)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(level=logging.INFO)
    register_datasets(cfg, args.data_root)
    return cfg


def trainer_class_for(cfg):
    name = cfg.MODEL.META_ARCHITECTURE
    if name == "WeakRCNN":
        return TrainerOnlyWeak
    if "FineTune" in cfg.MODEL.ROI_HEADS.FAST_RCNN.NAME:
        return TrainerFineTune
    return TrainerNoMeta


def build_everything(cfg, num_devices: Optional[int] = None, seed: int = 0):
    """(model, optimizer, trainer, mesh) for a config."""
    n = num_devices or len(jax.devices())
    mesh = make_mesh(min(n, len(jax.devices()))) if n > 1 else None
    mc = ModelConfig.from_cfg(cfg)
    model = WSRCNN(mc=mc)

    trainer_cls = trainer_class_for(cfg)
    strong_iter = None
    weak_iter = None
    if not cfg.DATASETS.TRAIN:
        raise ValueError("DATASETS.TRAIN is empty")
    strong_iter = Prefetcher(iter(build_strong_loader(cfg, seed=seed)))
    if trainer_cls is TrainerNoMeta or trainer_cls is TrainerOnlyWeak:
        weak_iter = Prefetcher(iter(build_classifier_loader(cfg, seed=seed + 1)))

    # optimizer over a params template
    from .train import create_train_state
    import optax

    dummy_opt = optax.sgd(0.0)
    tmp_state = create_train_state(model, dummy_opt, jax.random.PRNGKey(seed))
    optimizer = build_optimizer(cfg, tmp_state.params)

    trainer = trainer_cls(
        model, optimizer, strong_iter=strong_iter, weak_iter=weak_iter,
        rng=jax.random.PRNGKey(seed), mesh=mesh,
    )
    return model, optimizer, trainer, mesh


def load_initial_weights(cfg, params):
    """MODEL.WEIGHTS (.npz/.pkl/.pth) + GloVe embeddings into the param tree."""
    weights = cfg.MODEL.WEIGHTS
    if weights and os.path.exists(weights):
        if weights.endswith(".npz"):
            sd = dict(np.load(weights))
        else:
            import torch

            obj = torch.load(weights, map_location="cpu", weights_only=False)
            sd = obj.get("model", obj.get("state_dict", obj))
            sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params, loaded, skipped = load_torch_resnet(
            params, sd, load_res5_into=("box_head", "weak_box_head")
        )
        logger.info("loaded %d tensors from %s (%d skipped)", loaded, weights, len(skipped))
    emb = cfg.MODEL.ROI_HEADS.EMBEDDING_PATH
    if emb and os.path.exists(emb):
        params = load_glove_embeddings(params, emb)
        logger.info("loaded GloVe embeddings from %s", emb)
    return params


def make_eval_fn(cfg, model, mesh=None):
    mc = model.mc
    predict = make_predict_fn(model)

    def eval_fn(state):
        results = {}
        for name in cfg.DATASETS.TEST:
            loader, n = build_test_loader(cfg, name)
            evaluator = get_evaluator(cfg, name)
            for rec in DatasetCatalog.get(name):
                evaluator.process_gt_record(rec)
            params = state.params if hasattr(state, "params") else state
            results = inference_on_dataset(
                lambda im, sz: predict(params, im, sz), loader, evaluator, n
            )
        return results

    return eval_fn


def run(args):
    cfg = setup(args)
    model, optimizer, trainer, mesh = build_everything(cfg, args.num_gpus)
    state = trainer.init_state()
    params = load_initial_weights(cfg, jax.device_get(state.params))
    trainer.state = trainer.state.replace(params=jax.device_put(params))

    ckpt = Checkpointer(cfg.OUTPUT_DIR, max_to_keep=3)
    if args.resume and ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(template=jax.device_get(trainer.state))

    eval_fn = make_eval_fn(cfg, model, mesh)
    if args.eval_only:
        results = eval_fn(trainer.state)
        logger.info("eval results: %s", results)
        return results

    hooks = [
        MetricsHook(cfg.OUTPUT_DIR, period=20, max_iter=cfg.SOLVER.MAX_ITER),
        PeriodicCheckpointerWithEval(
            ckpt, eval_fn, cfg.TEST.EVAL_PERIOD, cfg.SOLVER.CHECKPOINT_PERIOD,
            cfg.TEST.MIN_EVAL_PERIOD,
        ),
    ]
    trainer.train(cfg.SOLVER.MAX_ITER, hooks=hooks)
    return eval_fn(trainer.state)
