"""coco_note / coco_dock dataset suites + full-fidelity VGG/Inception heads.

Covers the reference's dedicated experiment suites: ``coco_note_*``
registration over COCO2017 (ref data/datasets/coco_note/base_training.py:55-97)
with the InceptionResNetV2 head family, and ``coco_dock_*`` over COCO2014 (ref
coco_dock/base_training.py) for VGG-CNN-F + MCG proposals.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unit_tpu.config import get_cfg
from unit_tpu.data import DatasetCatalog
from unit_tpu.data.utils import register_datasets
from unit_tpu.models import WSRCNN
from unit_tpu.models.box_heads import BOX_HEAD_REGISTRY
from tests.test_model_smoke import tiny_config, _weak_batch


def _write_coco(root, split, n_images=4):
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, split), exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "height": 80, "width": 80})
        for c in [(i % 80) + 1, ((i + 7) % 80) + 1]:
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": c,
                "bbox": [5, 5, 30, 30], "area": 900, "iscrowd": 0,
            })
            aid += 1
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"c{c}"} for c in range(1, 81)],
    }
    with open(os.path.join(root, "annotations", f"instances_{split}.json"), "w") as f:
        json.dump(data, f)


@pytest.fixture
def coco_root(tmp_path):
    root = str(tmp_path / "coco")
    for split in ("train2017", "val2017", "train2014", "val2014"):
        _write_coco(root, split)
    return root


def _cfg_for(ds_type, root):
    cfg = get_cfg()
    cfg.DATASETS.FEWSHOT.TYPE = ds_type
    cfg.DATASETS.FEWSHOT.BASE_CLASSES_ID = list(range(0, 60))
    cfg.DATASETS.FEWSHOT.NOVEL_CLASSES_ID = list(range(60, 80))
    cfg.DATASETS.CLASSIFIER_DATAROOT = root
    return cfg


def test_note_and_dock_registration(coco_root):
    DatasetCatalog.clear()
    register_datasets(_cfg_for("COCO_NOTE", coco_root))
    register_datasets(_cfg_for("COCO_DOCK", coco_root))
    for prefix in ("coco_note", "coco_dock"):
        for suffix in ("base_training_query_train", "base_training_query_val",
                       "fine_tuning_query_train", "base_training_support"):
            name = f"{prefix}_{suffix}"
            assert name in DatasetCatalog, name
    # note rides 2017, dock rides 2014: poison the other year's json and verify
    # each suite still loads (lazy lambdas resolve only their own files)
    note_train = DatasetCatalog.get("coco_note_base_training_query_train")
    dock_train = DatasetCatalog.get("coco_dock_base_training_query_train")
    assert len(note_train) > 0 and len(dock_train) > 0
    assert "train2017" in note_train[0]["file_name"]
    assert "train2014" in dock_train[0]["file_name"]
    # classifier datasets are per-year
    assert "train2014" in DatasetCatalog.get("coco_train_2014")[0]["file_name"]
    assert "train2017" in DatasetCatalog.get("coco_train_2017")[0]["file_name"]


@pytest.mark.slow
def test_inception_head_shapes():
    head = BOX_HEAD_REGISTRY.get("InceptionResNetHead")()
    x = jnp.zeros((3, 14, 14, 1088))
    params = head.init(jax.random.PRNGKey(0), x)["params"]
    # full tail present: mixed_7a, 9 repeat block8s, final block8, conv2d_7b
    assert "m7a_b0_0" in params and "block8_8" in params
    assert "block8_final" in params and "conv2d_7b" in params
    out = head.apply({"params": params}, x)
    assert out.shape == (3, 1536)
    out4d = head.apply({"params": params}, x, spatial_mean=False)
    assert out4d.shape[1:3] == (6, 6) and out4d.shape[-1] == 1536


def test_vgg_head_dropout_train_vs_eval():
    head = BOX_HEAD_REGISTRY.get("VGGConvFCHead")(fc_dim=64)
    x = jnp.ones((4, 7, 7, 16))
    params = head.init(jax.random.PRNGKey(0), x)["params"]
    eval_out = head.apply({"params": params}, x)
    eval_out2 = head.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
    train_out = head.apply({"params": params}, x,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    # dropout active only when the rng is supplied
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))


@pytest.mark.slow
def test_note_model_family_step():
    """InceptionResNetV2 backbone + InceptionResNetHead: init + weak-only loss
    + predict (the note suite's model family, ref box_head.py:168-207)."""
    mc = tiny_config(
        backbone_name="build_inception_resnet_v2_backbone",
        box_head_name="InceptionResNetHead",
        rpn_conv_dim=256,
        pooler_resolution=14,
        multi_box_head=False,
        meta_architecture="WeakRCNN",
    )
    model = WSRCNN(mc=mc)
    imgs = jnp.zeros((1, 96, 96, 3))
    sizes = jnp.asarray([[96, 96]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, sizes)
    weak = _weak_batch(h=96, w=96)
    losses = model.apply(
        variables, jax.random.PRNGKey(1), None, weak, method=WSRCNN.train_losses
    )
    assert "loss_im_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    det = model.apply(variables, imgs, sizes, method=WSRCNN.predict_weak_only)
    assert np.isfinite(np.asarray(det.scores)).all()
