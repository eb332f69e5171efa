"""unit_tpu — a TPU-native any-shot detection framework.

Brand-new JAX/XLA/Pallas rebuild with the capabilities of ubc-vision/UniT
(CVPR 2021): Faster/Mask R-CNN C4 detection, weakly-supervised MIL+OICR/PCL
branch, lingual+visual base->novel transfer, base training and k-shot
fine-tuning, VOC/COCO evaluation with novel-class slicing.  See SURVEY.md for
the blueprint and file:line citations into the reference.
"""

__version__ = "0.1.0"
