import os

import pytest

from unit_tpu.config import get_cfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_have_unit_keys():
    cfg = get_cfg()
    assert cfg.MODEL.ROI_HEADS.FAST_RCNN.WEAK_DETECTOR.OICR_ITER == 3
    assert cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID == [2, 5, 9, 13, 17]
    assert cfg.SOLVER.REFINEMENT_LR_FACTOR == 1.0
    assert cfg.TEST.AUG.MIN_SIZES == (480, 576, 688, 864, 1200)


def test_merge_from_list_types():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.MASK_ON", "True",
                         "SOLVER.STEPS", "(12000,24000)"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.MASK_ON is True
    assert cfg.SOLVER.STEPS == (12000, 24000)


def test_merge_from_list_rejects_unknown_key():
    cfg = get_cfg()
    with pytest.raises(AssertionError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_freeze_blocks_mutation():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.MASK_ON = True
    cfg.defrost()
    cfg.MODEL.MASK_ON = True


def test_voc_yaml_with_base_inheritance():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "VOC", "VOC-RCNN-101-C4-split1.yaml"))
    # from the leaf file
    assert cfg.MODEL.META_ARCHITECTURE == "WeaklySupervisedRCNNNoMeta"
    assert cfg.MODEL.RESNETS.DEPTH == 101
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 20
    assert cfg.SOLVER.MAX_ITER == 30000
    assert cfg.TEST.AUG.ENABLED is False
    # from the _BASE_ file
    assert cfg.MODEL.RPN.POST_NMS_TOPK_TEST == 1000
    assert cfg.SOLVER.BASE_LR == 0.02


def test_clone_is_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.MODEL.MASK_ON = True
    assert cfg.MODEL.MASK_ON is False
