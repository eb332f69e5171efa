#!/usr/bin/env python
"""Export a trained detector to a self-contained StableHLO artifact.

    python scripts/export_model.py --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
        --out model.stablehlo.pkl MODEL.WEIGHTS runs/base/best/model

The artifact bakes the weights in as constants and contains one program per
test-canvas orientation, lowered for the CURRENT backend (export on the TPU
host for TPU serving).  Inspect with --describe.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--out", default="model.stablehlo.pkl")
    ap.add_argument("--describe", default="", help="print an artifact's metadata")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="export fixed-batch programs for micro-batched serving")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from unit_tpu.serving import describe, export_predict

    if args.describe:
        print(describe(args.describe))
        return
    if not args.config_file:
        ap.error("--config-file is required unless --describe is given")

    import types

    import jax
    import jax.numpy as jnp

    from unit_tpu.engine import runner
    from unit_tpu.models import ModelConfig, WSRCNN

    cfg = runner.setup(types.SimpleNamespace(
        config_file=args.config_file, opts=args.opts, data_root=None,
    ))
    model = WSRCNN(mc=ModelConfig.from_cfg(cfg))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.float32),
    )
    params = runner.load_initial_weights(cfg, variables["params"])

    from unit_tpu.data import MetadataCatalog

    class_names = None
    for name in cfg.DATASETS.TEST or ():
        names = MetadataCatalog.get(name).get("thing_classes")
        if names:
            class_names = list(names)
            break

    meta = export_predict(cfg, model, params, args.out, class_names=class_names,
                          batch_size=args.batch_size)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {meta['canvases']} ({meta['platforms']}) "
          f"-> {args.out} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
