#!/usr/bin/env python
"""Base training CLI (parity with the reference's scripts/train_VOC.py:22-77).

Usage:
  python scripts/train_VOC.py --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
      --num-gpus 4 [--eval-only] [--resume] SOLVER.BASE_LR 0.02 ...

The multi-process NCCL ``launch`` of the reference becomes single-program SPMD
over the jax device mesh; --num-gpus selects the mesh size.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unit_tpu.engine.runner import default_argument_parser, run  # noqa: E402

if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    run(args)
