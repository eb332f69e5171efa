#!/usr/bin/env python
"""Generic training CLI: works for any config (VOC or COCO, base or FT) since
dataset registration is driven by DATASETS.FEWSHOT.TYPE.  train_VOC.py /
finetune_VOC.py are kept for name parity with the reference scripts."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unit_tpu.engine.runner import default_argument_parser, run  # noqa: E402

if __name__ == "__main__":
    run(default_argument_parser().parse_args())
