"""Optimizer construction: SGD + warmup multistep LR + per-module LR factors +
freeze masks.

TPU rebuild of /root/reference/solver/build.py: ``build_optimizer_C4`` applies
momentum-SGD with weight decay and scales the LR of specific head groups —
REFINEMENT_LR_FACTOR for OICR/regression heads (:49-51,99-101), MIL_LR_FACTOR for
the MIL streams (:102-104), DELTA_LR_FACTOR for the delta predictors (:105-107) —
while freeze lists and BACKBONE.FREEZE_AT zero out updates entirely (the torch
version sets requires_grad=False; here we mask the optimizer, keeping the forward
pure).  The LR schedule is d2's WarmupMultiStepLR (SOLVER.STEPS/GAMMA/WARMUP_*).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence

import jax
import jax.numpy as jnp
import optax

# parameter-path fragments identifying the reference's LR groups
_REFINEMENT_KEYS = ("oicr_predictor", "regression_branch")
_MIL_KEYS = ("classifier_stream", "detection_stream")
_DELTA_KEYS = ("cls_score_delta", "bbox_pred_delta", "cls_score_ft", "bbox_pred_ft")


def path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def warmup_multistep(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int = 1000,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """d2 WarmupMultiStepLR: linear warmup then step decay at ``steps``."""

    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        if warmup_iters <= 0:
            # d2 _get_warmup_factor_at_iter returns 1.0 once iter >= warmup_iters
            warm = 1.0
        else:
            alpha = jnp.clip(it / warmup_iters, 0.0, 1.0)
            warm = warmup_factor * (1.0 - alpha) + alpha
        decay = gamma ** jnp.sum(it >= milestones.astype(jnp.float32))
        return base_lr * warm * decay

    return schedule


def _freeze_backbone_prefixes(freeze_at: int) -> List[str]:
    """BACKBONE.FREEZE_AT semantics: 1 freezes the stem, k>=2 freezes stem+res2..res_k."""
    out = []
    if freeze_at >= 1:
        out.append("backbone/stem")
    for stage in range(2, min(freeze_at, 5) + 1):
        out.append(f"backbone/res{stage}")
    return out


def lr_factor_for(path: str, cfg) -> float:
    if any(k in path for k in _REFINEMENT_KEYS):
        return cfg.SOLVER.REFINEMENT_LR_FACTOR
    if any(k in path for k in _MIL_KEYS):
        return cfg.SOLVER.MIL_LR_FACTOR
    if any(k in path for k in _DELTA_KEYS):
        return cfg.SOLVER.DELTA_LR_FACTOR
    if path.endswith("/bias"):
        return cfg.SOLVER.BIAS_LR_FACTOR
    return 1.0


def is_frozen(path: str, cfg, extra_frozen: Iterable[str] = ()) -> bool:
    """Whether a parameter never updates: frozen BN stats, GloVe embeddings,
    frozen backbone stages, and any cfg FREEZE_LAYERS entry."""
    if "_bn/" in path or path.endswith("_bn") or "/bn/" in path:
        return True
    if "embeddings" in path:
        return True
    for prefix in _freeze_backbone_prefixes(cfg.MODEL.BACKBONE.FREEZE_AT):
        if path.startswith(prefix):
            return True
    freeze_cfg = cfg.MODEL.FREEZE_LAYERS
    named = list(freeze_cfg.FAST_RCNN) + list(freeze_cfg.ROI_HEADS) + list(
        freeze_cfg.META_ARCH
    ) + list(freeze_cfg.BOX_HEAD) + list(freeze_cfg.MASK_HEAD)
    # reference freeze lists name top-level torch submodules; map the common ones
    alias = {
        "backbone": "backbone",
        "proposal_generator": "rpn_head",
        "rpn_head": "rpn_head",
        "box_head": "box_head/",
        "weak_box_head": "weak_box_head",
        "weak_detector_head": "weak_detector",
        "cls_score_delta": "cls_score_delta",
        "bbox_pred_delta": "bbox_pred_delta",
        "classifier_stream": "classifier_stream",
        "detection_stream": "detection_stream",
        "oicr_predictors": "oicr_predictor",
        "embeddings": "embeddings",
    }
    segments = path.split("/")

    def seg_match(frag: str) -> bool:
        # segment-wise matching so e.g. freezing 'box_head' does not also catch
        # 'weak_box_head'; prefix match covers numbered heads (oicr_predictor_0)
        frag = frag.strip("/")
        return any(s == frag or s.startswith(frag + "_") or s.startswith(frag)
                   and s[len(frag):len(frag) + 1].isdigit() for s in segments)

    for name in named:
        frag = alias.get(name, name)
        if frag and seg_match(frag):
            return True
    bounded = "/" + path + "/"
    for frag in extra_frozen:
        if not frag:
            continue
        if "/" in frag:
            # segment-boundary containment: 'box_head/' must not also catch
            # 'weak_box_head/...'
            if "/" + frag.strip("/") + "/" in bounded:
                return True
        elif seg_match(frag):
            return True
    return False


def build_optimizer(cfg, params, extra_frozen: Iterable[str] = ()) -> optax.GradientTransformation:
    """SGD(momentum, weight decay) with per-leaf LR factors and freeze masking.

    Mirrors build_optimizer_C4 (/root/reference/solver/build.py:61-115): per-param
    LR = BASE_LR * group factor, weight decay on non-bias weights, optional grad
    clipping; schedule = WarmupMultiStepLR.
    """
    schedule = warmup_multistep(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_ITERS,
    )

    factors = jax.tree_util.tree_map_with_path(
        lambda p, _: 0.0 if is_frozen(path_str(p), cfg, extra_frozen)
        else lr_factor_for(path_str(p), cfg),
        params,
    )
    # Reference semantics (solver/build.py:92-101 + d2 SGD param groups): biases
    # decay with SOLVER.WEIGHT_DECAY_BIAS (default == WEIGHT_DECAY), other
    # weights with SOLVER.WEIGHT_DECAY.  WEIGHT_DECAY_NORM is moot here: every
    # norm layer is FrozenBN whose params never reach the optimizer.
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: (not path_str(p).endswith("bias"))
        and not is_frozen(path_str(p), cfg, extra_frozen),
        params,
    )
    wd_bias_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: path_str(p).endswith("bias")
        and not is_frozen(path_str(p), cfg, extra_frozen),
        params,
    )

    frozen_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: is_frozen(path_str(p), cfg, extra_frozen), params
    )

    chain = [
        # Zero frozen-parameter gradients BEFORE momentum: with only the final
        # LR factor at 0 the trace still CONSUMES the gradients, so XLA cannot
        # dead-code-eliminate the frozen layers' backward (wgrad convs + the
        # dgrad chains feeding them).  Zeroing up front makes the computed
        # gradient values unused and the whole frozen backward prunes away —
        # the reference's requires_grad=False semantics (solver/build.py:61-115
        # only creates param groups for requires_grad params).  Gradient FLOW
        # through frozen modules to earlier trainable ones is unaffected.
        optax.masked(optax.set_to_zero(), frozen_mask)
    ]
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    if cfg.SOLVER.WEIGHT_DECAY:
        chain.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY, mask=wd_mask))
    wd_bias = float(cfg.SOLVER.WEIGHT_DECAY_BIAS)
    if wd_bias:
        chain.append(optax.add_decayed_weights(wd_bias, mask=wd_bias_mask))
    chain.append(
        optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV)
    )
    chain.append(optax.scale_by_learning_rate(schedule))
    # per-leaf factor (0 for frozen) applied after the global schedule
    chain.append(
        optax.GradientTransformation(
            init=lambda _: optax.EmptyState(),
            update=lambda updates, state, params=None: (
                jax.tree.map(lambda u, f: u * f, updates, factors),
                state,
            ),
        )
    )
    return optax.chain(*chain)


def modify_for_weak_only(cfg, params) -> optax.GradientTransformation:
    """modify_optimizer_C4 (/root/reference/solver/build.py:117-186): during the
    TRAIN_ONLY_WEAK phase the supervised branch is frozen entirely."""
    extra = ["supervised", "box_head/", "rpn_head", "backbone"]
    return build_optimizer(cfg, params, extra_frozen=extra)
