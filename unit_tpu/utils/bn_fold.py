"""Fold FrozenBN affine transforms into the preceding conv kernels (inference).

The d2-style frozen BatchNorm (models/resnet.py::FrozenBN, matching the
reference's FrozenBatchNorm2d) applies ``y = x * s + t`` with
``s = weight / sqrt(var + eps)`` and ``t = bias - mean * s`` after every
convolution.  For a *forward-only* pass the per-channel multiply can be folded
into the conv kernel once (``conv(x, W * s) + t``), removing it from the
epilogue.  Measured on chip (scripts/bench_backbone_epilogue.py, BASELINE.md
round 4): -22% forward on a res4 bottleneck block — but +5% for fwd+bwd, since
training must differentiate through ``W * s``.  Hence this transform is
EVAL-ONLY, applied to the parameter pytree once per evaluation
(TPU.FOLD_BN_AT_EVAL), never inside the differentiated train step.

The fold is exact in real arithmetic; in floats it reorders the rounding
(fp32 kernel scaled before the bf16 cast, instead of a bf16 epilogue
multiply), so folded outputs differ from unfolded at bf16 resolution.  The
reference never folds (FrozenBatchNorm2d stays an epilogue), so the flag
defaults off; tests/test_bn_fold.py bounds the drift.
"""

from __future__ import annotations

import jax.numpy as jnp

BN_KEYS = frozenset({"weight", "bias", "mean", "var"})


def fold_frozen_bn(params, eps: float = 1e-5):
    """Return a params pytree with every ``X`` / ``X_bn`` Conv+FrozenBN pair folded.

    For each sibling pair where ``X`` holds a conv ``kernel`` (HWIO) and
    ``X_bn`` holds FrozenBN's {weight, bias, mean, var}, the kernel's output
    channels are scaled by ``s`` and the BN params are rewritten to the
    identity-scale / ``t``-shift form (weight=1, mean=0, var=1-eps, bias=t),
    so the module graph is unchanged and FrozenBN degenerates to a single add.

    Only ResNet-C4/Res5 use FrozenBN (models/resnet.py); the naming convention
    there ties every BN to its conv as ``<conv>_bn``.  Unpaired BNs (no conv
    sibling) are left untouched.
    """

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {k: walk(v) for k, v in tree.items()}
        for name in list(out):
            if not name.endswith("_bn"):
                continue
            bn = out[name]
            conv = out.get(name[: -len("_bn")])
            if not (isinstance(bn, dict) and BN_KEYS <= set(bn)):
                continue
            if not (isinstance(conv, dict) and "kernel" in conv):
                continue
            scale = bn["weight"] / jnp.sqrt(bn["var"] + eps)
            shift = bn["bias"] - bn["mean"] * scale
            # HWIO kernel: scale broadcasts over the output-channel minor dim
            out[name[: -len("_bn")]] = dict(conv, kernel=conv["kernel"] * scale)
            out[name] = dict(
                bn,
                weight=jnp.ones_like(bn["weight"]),
                bias=shift,
                mean=jnp.zeros_like(bn["mean"]),
                # var = 1 - eps makes FrozenBN's sqrt(var + eps) exactly 1
                var=jnp.full_like(bn["var"], 1.0 - eps),
            )
        return out

    return walk(params)
