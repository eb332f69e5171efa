"""Every shipped YAML must parse and produce a coherent ModelConfig."""

import glob
import os

import pytest

from unit_tpu.config import get_cfg
from unit_tpu.models import ModelConfig

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_DIR, "**", "*.yaml"), recursive=True)
    if "Base-" not in p
)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.basename(p))
def test_config_builds_model_config(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    mc = ModelConfig.from_cfg(cfg)
    assert mc.num_classes in (20, 80)
    assert len(mc.base_ids) + len(mc.novel_ids) == mc.num_classes
    assert set(mc.base_ids).isdisjoint(mc.novel_ids)
    if "ft" in os.path.basename(path):
        assert mc.finetune
        assert cfg.MODEL.FREEZE_LAYERS.FAST_RCNN  # FT configs freeze base heads
    if "segm" in os.path.basename(path):
        assert mc.mask_on
    if "dock" in os.path.basename(path):
        assert mc.load_proposals and mc.backbone_name == "VGG_CNN_F"
    if "note" in os.path.basename(path):
        assert mc.backbone_name == "InceptionResNetV2"
        assert mc.normalize_images


def test_expected_config_count():
    # base C4 + 3 VOC + 15 VOC FT + 6 COCO = 25 files (>= the reference's 22)
    assert len(ALL_CONFIGS) >= 24
