#!/usr/bin/env python
"""Serve a trained UniT detector over HTTP.

    # from a training run / converted weights (jits on startup):
    python scripts/serve.py --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
        --port 8080 MODEL.WEIGHTS runs/base/best/model

    # from a StableHLO artifact produced by scripts/export_model.py
    # (no checkpoint / weights needed — they are baked into the artifact):
    python scripts/serve.py --config-file ... --artifact model.stablehlo.pkl

    curl -X POST --data-binary @image.jpg localhost:8080/predict

Endpoints: POST /predict (image bytes -> JSON detections in original-image
coordinates), GET /healthz, GET /metadata.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--artifact", default="", help="StableHLO artifact path")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="micro-batch concurrent requests into one device "
                         "call of this size (ignored with --artifact: the "
                         "artifact's exported batch size wins)")
    ap.add_argument("--batch-wait-ms", type=float, default=5.0,
                    help="max extra latency to wait for a full micro-batch")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import types

    from unit_tpu.engine import runner
    from unit_tpu.serving import (
        DetectionServer, DetectionService, load_exported,
    )

    setup_args = types.SimpleNamespace(
        config_file=args.config_file, opts=args.opts, data_root=None,
    )
    cfg = runner.setup(setup_args)
    class_names = _class_names(cfg)

    if args.artifact:
        exported = load_exported(args.artifact)
        service = DetectionService(cfg, exported=exported, class_names=class_names,
                                   batch_wait_ms=args.batch_wait_ms)
        metadata = dict(exported.meta)
    else:
        import jax
        import jax.numpy as jnp

        from unit_tpu.models import ModelConfig, WSRCNN

        model = WSRCNN(mc=ModelConfig.from_cfg(cfg))
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.asarray([[64, 64]], jnp.float32),
        )
        params = runner.load_initial_weights(cfg, variables["params"])
        service = DetectionService(cfg, model=model, params=params,
                                  class_names=class_names,
                                  batch_size=args.batch_size,
                                  batch_wait_ms=args.batch_wait_ms)
        metadata = {
            "config": args.config_file,
            "weights": cfg.MODEL.WEIGHTS,
            "num_classes": int(cfg.MODEL.ROI_HEADS.NUM_CLASSES),
            "class_names": class_names,
            "batch_size": args.batch_size,
        }
    if not args.no_warmup:
        print("warming up (compiling both canvas orientations)...", flush=True)
        service.warmup()
    server = DetectionServer(service, host=args.host, port=args.port,
                             metadata=metadata)
    # graceful shutdown: finish in-flight requests, stop the micro-batcher
    import signal
    import threading

    def _stop(signum, frame):
        print(f"signal {signum}: shutting down", flush=True)
        # shutdown() blocks until serve_forever returns -> run off-thread
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    print(f"serving on {args.host}:{server.port}", flush=True)
    server.serve_forever()


def _class_names(cfg):
    from unit_tpu.data import MetadataCatalog

    for name in cfg.DATASETS.TEST or ():
        names = MetadataCatalog.get(name).get("thing_classes")
        if names:
            return list(names)
    return None


if __name__ == "__main__":
    main()
