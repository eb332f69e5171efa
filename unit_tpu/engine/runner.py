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

from ..config import get_cfg, validate_registry_names
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
from ..utils.events import MetricsHook, print_csv_format
from .train import (
    Trainer,
    TrainerFineTune,
    TrainerNoMeta,
    TrainerOnlyWeak,
    TrainerOnlyWeakFineTune,
    make_predict_fn,
)

logger = logging.getLogger("unit_tpu")


def setup_logger(output_dir: Optional[str] = None, level: int = logging.INFO):
    """Configure the "unit_tpu" logger for CLI runs (ref setup_logger,
    scripts/train_VOC.py:36): stream to stdout + a log.txt in OUTPUT_DIR.

    logging.basicConfig is NOT enough here: jax/absl install a root handler at
    import time, which turns basicConfig into a silent no-op and leaves the
    root level at WARNING — every INFO line (iteration logs, eval CSV results)
    was being dropped in the shipped CLIs.
    """
    lg = logging.getLogger("unit_tpu")
    lg.setLevel(level)
    lg.propagate = False
    fmt = logging.Formatter(
        "[%(asctime)s unit_tpu]: %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    if not any(
        isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
        for h in lg.handlers
    ):
        import sys

        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        lg.addHandler(sh)
    if output_dir and not any(
        isinstance(h, logging.FileHandler) for h in lg.handlers
    ):
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(fmt)
        lg.addHandler(fh)
    return lg


def default_argument_parser():
    parser = argparse.ArgumentParser(description="unit_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=1,
                        help="number of mesh devices (name kept for parity)")
    parser.add_argument("--data-root", default=None)
    parser.add_argument(
        "--dist", action="store_true",
        help="multi-host: jax.distributed.initialize() (replaces the reference's "
             "SLURM-derived NCCL rendezvous, scripts/train_VOC.py:56-77)",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def auto_scale_workers(cfg, num_workers: int):
    """SOLVER.REFERENCE_WORLD_SIZE linear-scaling-rule adjustment.

    The reference documents this knob for running its 4-GPU recipes on other
    worker counts (/root/reference/README.md:51, deferring to d2's
    DefaultTrainer.auto_scale_workers).  Semantics reproduced here: when
    REFERENCE_WORLD_SIZE is nonzero and differs from the actual device count,
    the global batch and BASE_LR scale UP by num_workers/old, and the
    iteration-denominated quantities (MAX_ITER, WARMUP_ITERS, STEPS,
    EVAL_PERIOD, CHECKPOINT_PERIOD) scale DOWN, keeping total epochs and the
    LR-vs-epoch curve invariant.  REFERENCE_WORLD_SIZE is rewritten to
    num_workers so the scaling is idempotent (the saved config can be reused).
    """
    old = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old == 0 or old == num_workers:
        return cfg
    was_frozen = cfg.is_frozen()
    cfg = cfg.clone()
    cfg.defrost()
    if cfg.SOLVER.IMS_PER_BATCH % old != 0:
        raise ValueError(
            f"SOLVER.IMS_PER_BATCH {cfg.SOLVER.IMS_PER_BATCH} not divisible by "
            f"REFERENCE_WORLD_SIZE {old}")
    scale = num_workers / old
    cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
    logging.getLogger("unit_tpu").info(
        "auto_scale_workers: %d -> %d workers; IMS_PER_BATCH=%d BASE_LR=%g "
        "MAX_ITER=%d WARMUP_ITERS=%d STEPS=%s",
        old, num_workers, cfg.SOLVER.IMS_PER_BATCH, cfg.SOLVER.BASE_LR,
        cfg.SOLVER.MAX_ITER, cfg.SOLVER.WARMUP_ITERS, cfg.SOLVER.STEPS)
    if was_frozen:
        cfg.freeze()
    return cfg


def setup(args):
    # UNIT_TPU_PLATFORM=cpu forces the CPU backend through the config API (the
    # axon harness pins JAX_PLATFORMS in the env, so the env var alone is
    # ignored — same workaround as tests/conftest.py).
    plat = os.environ.get("UNIT_TPU_PLATFORM", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    # persistent compile cache for the CLI runs (same as bench.py): repeat
    # train/eval invocations skip the multi-minute remote compiles
    from unit_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    num_devices = getattr(args, "num_gpus", 0) or len(jax.devices())
    cfg = auto_scale_workers(cfg, num_devices)
    cfg.freeze()
    validate_registry_names(cfg)  # reject unknown registry names at setup
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logger(cfg.OUTPUT_DIR)
    if cfg.TPU.DEBUG_NANS:
        jax.config.update("jax_debug_nans", True)
    register_datasets(cfg, args.data_root)
    return cfg


_TRAINERS = {
    "Trainer": Trainer,
    "TrainerNoMeta": TrainerNoMeta,
    "TrainerFineTune": TrainerFineTune,
    "TrainerOnlyWeak": TrainerOnlyWeak,
    "TrainerOnlyWeakFineTune": TrainerOnlyWeakFineTune,
}


def trainer_class_for(cfg):
    explicit = getattr(cfg, "ENGINE", None) and cfg.ENGINE.TRAINER
    if explicit:
        if explicit not in _TRAINERS:
            raise KeyError(f"unknown ENGINE.TRAINER {explicit!r}; one of {sorted(_TRAINERS)}")
        return _TRAINERS[explicit]
    name = cfg.MODEL.META_ARCHITECTURE
    if name == "WeakRCNN":
        return TrainerOnlyWeak
    if "FineTune" in cfg.MODEL.ROI_HEADS.FAST_RCNN.NAME:
        return TrainerFineTune
    if cfg.MODEL.ROI_HEADS.NAME == "WSROIHead":
        return Trainer  # meta/support-stream trainer (defaults.py:41-248)
    return TrainerNoMeta


def build_everything(cfg, num_devices: Optional[int] = None, seed: int = 0,
                     start_step: int = 0):
    """(model, optimizer, trainer, mesh) for a config.

    ``start_step`` > 0 (--resume): every training stream is fast-forwarded
    past the batches the preempted run already consumed, so the resumed run
    sees exactly the data an uninterrupted run would have (the reference's
    d2-style infinite sampler replays from the beginning instead)."""
    n = num_devices or len(jax.devices())
    n = min(n, len(jax.devices()))
    tp = int(getattr(cfg.TPU, "TP", 1) or 1)
    pp = bool(getattr(cfg.TPU, "PP", False))
    if pp:
        from ..parallel import make_mesh_pp

        assert tp == 1, "TPU.PP does not compose with TPU.TP"
        stages = int(getattr(cfg.TPU, "PP_STAGES", 2) or 2)
        assert n % stages == 0, (
            f"TPU.PP needs a device count divisible by TPU.PP_STAGES={stages}, got {n}"
        )
        mesh = make_mesh_pp(n // stages, stages)
    elif tp > 1:
        from ..parallel import make_mesh_tp

        assert n % tp == 0, f"device count {n} not divisible by TPU.TP={tp}"
        mesh = make_mesh_tp(n // tp, tp)
    else:
        mesh = make_mesh(n) if n > 1 else None
    mc = ModelConfig.from_cfg(cfg)
    model = WSRCNN(mc=mc)

    trainer_cls = trainer_class_for(cfg)
    strong_iter = None
    weak_iter = None
    meta_iter = None
    grad_accum = int(getattr(cfg.TPU, "GRAD_ACCUM", 1) or 1)

    def _ff(loader, per_step: int = 1):
        # exact resume: each train step consumes `per_step` batches from this
        # stream (grad accumulation stacks that many microbatches)
        if start_step > 0:
            loader.fast_forward(start_step * per_step)
        return loader

    if trainer_cls is TrainerOnlyWeakFineTune:
        # classifier data fed as the boxed supervised batch (defaults.py:402-425)
        from ..data.loader import build_classifier_strong_loader

        strong_iter = Prefetcher(iter(_ff(build_classifier_strong_loader(cfg, seed=seed), grad_accum)))
    else:
        if not cfg.DATASETS.TRAIN:
            raise ValueError("DATASETS.TRAIN is empty")
        strong_iter = Prefetcher(iter(_ff(build_strong_loader(cfg, seed=seed), grad_accum)))
    if trainer_cls in (TrainerNoMeta, TrainerOnlyWeak, Trainer):
        weak_iter = Prefetcher(iter(_ff(build_classifier_loader(cfg, seed=seed + 1), grad_accum)))
    if trainer_cls is Trainer:
        from ..data.loader import build_support_loader

        support_name = {
            "VOC": "voc_base_training_support",
            "COCO": "coco_base_training_support",
        }.get(cfg.DATASETS.FEWSHOT.TYPE, "voc_base_training_support")
        meta_iter = iter(_ff(build_support_loader(cfg, support_name, seed=seed + 2)))

    # optimizer over a params template
    from .train import create_train_state
    import optax

    dummy_opt = optax.sgd(0.0)
    tmp_state = create_train_state(model, dummy_opt, jax.random.PRNGKey(seed))
    optimizer = build_optimizer(cfg, tmp_state.params)

    trainer = trainer_cls(
        model, optimizer, strong_iter=strong_iter, weak_iter=weak_iter,
        meta_iter=meta_iter, rng=jax.random.PRNGKey(seed), mesh=mesh,
        fsdp=cfg.TPU.FSDP, tp=tp > 1, pp=pp,
        grad_accum=grad_accum,
    )
    return model, optimizer, trainer, mesh


def load_initial_weights(cfg, params):
    """MODEL.WEIGHTS (.npz/.pkl/.pth) + GloVe embeddings into the param tree."""
    weights = cfg.MODEL.WEIGHTS
    if weights and os.path.isdir(weights):
        # orbax snapshot from one of our own runs (e.g. <base_run>/best/model):
        # the fine-tune warm start (ref FT yaml MODEL.WEIGHTS, d2-tolerant merge)
        from ..checkpoint import merge_params_from_orbax

        params, loaded, skipped = merge_params_from_orbax(params, weights)
        logger.info("warm-started %d tensors from orbax %s (%d new/skipped)",
                    loaded, weights, len(skipped))
    elif weights and not os.path.exists(weights):
        # the reference's DetectionCheckpointer raises on missing files too;
        # silently evaluating a random-init model is far worse than failing
        raise FileNotFoundError(
            f"MODEL.WEIGHTS points at {weights!r}, which does not exist"
        )
    elif weights:
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


def make_eval_fn(cfg, model, mesh=None, image_loader=None):
    from ..models import WSRCNN

    use_tta = cfg.TEST.AUG.ENABLED
    use_test_proposals = bool(
        cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST
    )
    predict = (
        make_predict_fn(model, with_proposals=True)
        if use_test_proposals
        else make_predict_fn(model)
    )
    # meta configs compute the support prototypes ONCE pre-eval and thread them
    # through the meta eval driver (Trainer.get_meta_attention + test(),
    # reference engine/defaults.py:180-248).  Downstream they are semantically
    # dead — the reference's attention-driven visual-similarity branch at
    # inference is commented out (roi_heads.py:386-389) — pinned by
    # tests/test_meta_eval_driver.py.
    is_meta = model is not None and getattr(
        getattr(model, "mc", None), "use_meta", False
    )

    def _meta_attention(params):
        from ..data.loader import build_support_loader
        from ..models import WSRCNN as _WSRCNN

        support_name = {
            "VOC": "voc_base_training_support",
            "COCO": "coco_base_training_support",
        }.get(cfg.DATASETS.FEWSHOT.TYPE, "voc_base_training_support")
        if support_name not in DatasetCatalog:
            logger.warning(
                "meta eval: support dataset %s not registered; skipping "
                "attention precompute", support_name,
            )
            return None
        loader = build_support_loader(
            cfg, support_name, deterministic=True, image_loader=image_loader
        )
        batch = next(iter(loader))
        return model.apply(
            {"params": params}, batch, method=_WSRCNN.compute_meta_attention
        )
    if use_tta:
        # flip flags must be compile-time constants; scales/images are traced
        flips = []
        for _ in cfg.TEST.AUG.MIN_SIZES:
            flips.append(False)
            if cfg.TEST.AUG.FLIP:
                flips.append(True)
        flips = tuple(flips)

        if use_test_proposals:
            # precomputed-proposal (dock-style) models never train an RPN:
            # thread the canonical-frame proposal boxes into predict_tta,
            # which rescales/flips them per variant (rcnn.py:47-83)
            @jax.jit
            def tta_fn(params, cimg, csz, var_arrays, pb, pv):
                variants = [
                    {"image": im, "image_size": sz, "scale": sc, "flip": fl}
                    for (im, sz, sc), fl in zip(var_arrays, flips)
                ]
                return model.apply(
                    {"params": params}, cimg, csz, variants,
                    proposal_boxes=pb, proposal_valid=pv,
                    tta_topk=cfg.TPU.TTA_PROPOSAL_TOPK,
                    method=WSRCNN.predict_tta,
                )
        else:
            @jax.jit
            def tta_fn(params, cimg, csz, var_arrays):
                variants = [
                    {"image": im, "image_size": sz, "scale": sc, "flip": fl}
                    for (im, sz, sc), fl in zip(var_arrays, flips)
                ]
                return model.apply(
                    {"params": params}, cimg, csz, variants,
                    tta_topk=cfg.TPU.TTA_PROPOSAL_TOPK,
                    method=WSRCNN.predict_tta,
                )

    def eval_fn(state):
        # Accumulate per-dataset (ref engine/defaults.py:219-248); with a single
        # test dataset return its metrics flat, matching d2's DefaultTrainer.test.
        all_results = {}
        for name in cfg.DATASETS.TEST:
            evaluator = get_evaluator(cfg, name)
            # multi-process: feed only THIS host's record slice — the test
            # loaders iterate the same slice, and the cross-host evaluator
            # merge (evaluation/evaluator.py) reassembles the full dataset;
            # full-GT-per-host would double-count after the merge
            from ..data.loader import _host_shard

            for rec in _host_shard(DatasetCatalog.get(name)):
                evaluator.process_gt_record(rec)
            params = state.params if hasattr(state, "params") else state
            if getattr(cfg.TPU, "FOLD_BN_AT_EVAL", False):
                # eval-only Conv+FrozenBN fold (utils/bn_fold.py): -22% forward
                # on backbone blocks, rejected for training (BASELINE.md round 4)
                from ..utils.bn_fold import fold_frozen_bn

                params = fold_frozen_bn(params)
            if use_tta:
                from ..data.loader import build_tta_test_loader

                loader, n = build_tta_test_loader(cfg, name, image_loader)

                def predict_batch(batch):
                    var_arrays = [
                        (v["image"], v["image_size"], np.float32(v["scale"]))
                        for v in batch["variants"]
                    ]
                    if use_test_proposals:
                        return tta_fn(
                            params, batch["image"], batch["image_size"], var_arrays,
                            batch["proposals"], batch["proposals_valid"],
                        )
                    return tta_fn(
                        params, batch["image"], batch["image_size"], var_arrays
                    )

                all_results[name] = _run_tta_eval(predict_batch, loader, evaluator, n)
            else:
                loader, n = build_test_loader(
                    cfg, name, image_loader=image_loader,
                    batch_size=int(getattr(cfg.TPU, "EVAL_BATCH_SIZE", 1)),
                )
                if use_test_proposals:
                    fn = lambda im, sz, pb, pv: predict(params, im, sz, pb, pv)  # noqa: E731
                else:
                    fn = lambda im, sz: predict(params, im, sz)  # noqa: E731
                att = _meta_attention(params) if is_meta else None
                if att is not None:
                    from ..evaluation import inference_on_dataset_meta

                    all_results[name] = inference_on_dataset_meta(
                        # attention is threaded but dead at inference,
                        # exactly as in the reference (see _meta_attention)
                        lambda _att, *a: fn(*a), loader, att, evaluator, n,
                    )
                else:
                    all_results[name] = inference_on_dataset(
                        fn, loader, evaluator, n
                    )
        if len(all_results) == 1:
            return next(iter(all_results.values()))
        return all_results

    return eval_fn


def _run_tta_eval(predict_batch, loader, evaluator, total):
    # evaluator arrives with GT records already fed — do not reset it
    import numpy as np

    for batch in loader:
        det = predict_batch(batch)
        # single batched host transfer (per-field fetches pay a device
        # round-trip each — costly on remote-attached TPUs)
        bx, sc, cl, va = jax.device_get(
            (det.boxes, det.scores, det.classes, det.valid)
        )
        boxes = np.array(bx[0]) / batch["scale"][0]
        oh, ow = batch["orig_size"][0]
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, ow)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, oh)
        evaluator.process(batch["image_id"][0], boxes, sc[0], cl[0], va[0])
    return evaluator.evaluate()


class PreciseBNHook:
    """Optional PreciseBN refresh before each periodic eval (ref
    engine/defaults.py:304-311: d2 ``hooks.PreciseBN`` runs right before the
    checkpointer so the refreshed stats are both evaluated and saved).
    Recomputes FrozenBN mean/var over ``num_iter`` training batches and writes
    them into the live train state."""

    def __init__(self, model, cfg, loader_factory, eval_period: int, num_iter: int):
        self.model = model
        self.cfg = cfg
        self.loader_factory = loader_factory
        self.eval_period = eval_period
        self.num_iter = num_iter

    def __call__(self, step: int, metrics: dict, trainer):
        if not self.eval_period or step % self.eval_period != 0:
            return
        from ..utils.precise_bn import precise_bn

        params = precise_bn(
            self.model, trainer.state.params, self.loader_factory(), self.num_iter
        )
        trainer.state = trainer.state.replace(params=jax.device_put(params))
        logger.info("PreciseBN: refreshed FrozenBN statistics over %d batches",
                    self.num_iter)


def run(args):
    if getattr(args, "dist", False):
        jax.distributed.initialize()
    cfg = setup(args)
    seed = cfg.SEED if cfg.SEED >= 0 else 0
    ckpt = Checkpointer(cfg.OUTPUT_DIR, max_to_keep=3)
    resume_step = ckpt.latest_step() if args.resume else None
    model, optimizer, trainer, mesh = build_everything(
        cfg, args.num_gpus, seed=seed,
        start_step=0 if args.eval_only else int(resume_step or 0),
    )
    state = trainer.init_state()
    params = load_initial_weights(cfg, jax.device_get(state.params))
    trainer.state = trainer.state.replace(params=jax.device_put(params))

    if resume_step is not None:
        trainer.state = ckpt.restore(template=jax.device_get(trainer.state))
        logger.info("resuming from step %d", int(resume_step))

    eval_fn = make_eval_fn(cfg, model, mesh)
    if args.eval_only:
        results = eval_fn(trainer.state)
        logger.info("eval results: %s", results)
        print_csv_format(results)
        return results

    from ..solver.build import warmup_multistep

    lr_schedule = warmup_multistep(
        cfg.SOLVER.BASE_LR, cfg.SOLVER.STEPS, cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR, cfg.SOLVER.WARMUP_ITERS,
    )
    hooks = [
        MetricsHook(cfg.OUTPUT_DIR, period=20, max_iter=cfg.SOLVER.MAX_ITER,
                    lr_fn=lr_schedule),
    ]
    profile_hook = None
    if cfg.TPU.PROFILE_START_STEP > 0:
        from ..utils.profiling import ProfileHook

        profile_hook = ProfileHook(
            os.path.join(cfg.OUTPUT_DIR, "trace"),
            start=cfg.TPU.PROFILE_START_STEP,
            num_steps=cfg.TPU.PROFILE_NUM_STEPS,
        )
        hooks.append(profile_hook)
    if cfg.TEST.PRECISE_BN.ENABLED:
        hooks.append(PreciseBNHook(
            model, cfg,
            loader_factory=lambda: iter(build_strong_loader(cfg)),
            eval_period=cfg.TEST.EVAL_PERIOD,
            num_iter=cfg.TEST.PRECISE_BN.NUM_ITER,
        ))
    hooks += [
        PeriodicCheckpointerWithEval(
            ckpt, eval_fn, cfg.TEST.EVAL_PERIOD, cfg.SOLVER.CHECKPOINT_PERIOD,
            cfg.TEST.MIN_EVAL_PERIOD,
        ),
    ]
    # Preemption safety (TPU pods get SIGTERM ahead of eviction): request a
    # clean loop exit after the in-flight step, then checkpoint below so
    # --resume continues from the preempted step.  The reference has no
    # analogue (crash -> lose everything since the last periodic save).
    import signal

    prev_handlers = {}

    def _on_preempt(signum, frame):
        logger.warning("signal %d: stopping after the current step", signum)
        trainer.request_stop()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_preempt)
        except ValueError:  # non-main thread (e.g. tests): skip
            pass

    try:
        trainer.train(cfg.SOLVER.MAX_ITER, hooks=hooks)
        if trainer.stop_requested:
            step = int(trainer.state.step)
            if ckpt.latest_step() != step:  # periodic hook may have just saved
                logger.warning("preempted at iter %d: saving checkpoint", step)
                ckpt.save(step, jax.device_get(trainer.state), wait=True)
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        if profile_hook is not None:
            profile_hook.close()  # training may have ended inside the window
        trainer.close()
        ckpt.wait()  # join async checkpoint writes before the final eval/exit
    if trainer.stop_requested:  # preempted: exit promptly, skip the final eval
        return None
    results = eval_fn(trainer.state)
    print_csv_format(results)
    return results
