#!/usr/bin/env python
"""k-shot fine-tuning CLI (parity with the reference's scripts/finetune_VOC.py).

Uses the fine-tune trainer (single k-shot strong stream, similarity transfer
active during training) selected automatically from the config's
SupervisedDetectorOutputsFineTune head.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unit_tpu.engine.runner import default_argument_parser, run  # noqa: E402

if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    run(args)
