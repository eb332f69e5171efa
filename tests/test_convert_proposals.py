"""scripts/convert_proposals.py: external proposal dumps -> LOAD_PROPOSALS format.

Round-trips synthetic versions of both source formats (legacy VOC pickles and
MCG .mat directories, per the reference's data_utils converters) through the
CLI and back through unit_tpu.data.proposals.load_proposal_file, checking the
id formatting and the 1-based-YXYX -> 0-based-XYXY box conversion exactly.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from convert_proposals import convert_coco_mcg, convert_voc  # noqa: E402

from unit_tpu.data.proposals import load_proposal_file


def test_voc_2007_ids_and_roundtrip(tmp_path):
    raw = {
        "indexes": [12, 345678],
        "boxes": [np.array([[1.0, 2.0, 30.0, 40.0]]), np.zeros((2, 4))],
        "scores": [np.array([0.9]), np.array([0.5, 0.1])],
    }
    src = tmp_path / "raw.pkl"
    dst = tmp_path / "out.pkl"
    src.write_bytes(pickle.dumps(raw))
    assert convert_voc(str(src), str(dst)) == 2

    table = load_proposal_file(str(dst))
    assert set(table) == {"000012", "345678"}
    np.testing.assert_array_equal(
        table["000012"]["boxes"], np.array([[1, 2, 30, 40]], np.float32)
    )
    np.testing.assert_array_equal(
        table["000012"]["scores"], np.asarray([0.9], np.float32)
    )


def test_voc_2012_id_formatting(tmp_path):
    raw = {
        "indexes": [2012003541],
        "boxes": [np.zeros((1, 4))],
        "scores": [np.array([1.0])],
    }
    src, dst = tmp_path / "r.pkl", tmp_path / "o.pkl"
    src.write_bytes(pickle.dumps(raw))
    convert_voc(str(src), str(dst), voc_year=2012)
    assert set(load_proposal_file(str(dst))) == {"2012_003541"}


def test_coco_mcg_box_convention(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    mat_dir = tmp_path / "mats"
    mat_dir.mkdir()
    # MCG: 1-based (ymin, xmin, ymax, xmax)
    scipy_io.savemat(
        str(mat_dir / "COCO_val2014_000000000139.mat"),
        {
            "boxes": np.array([[11.0, 6.0, 51.0, 41.0]]),
            "scores": np.array([[0.75]]),
        },
    )
    dst = tmp_path / "coco.pkl"
    assert convert_coco_mcg(str(mat_dir), str(dst)) == 1

    table = load_proposal_file(str(dst))
    assert set(table) == {"139"}
    # 0-based XYXY: x = 6-1, y = 11-1, x2 = 41-1, y2 = 51-1
    np.testing.assert_array_equal(
        table["139"]["boxes"], np.array([[5, 10, 40, 50]], np.float32)
    )
    np.testing.assert_array_equal(
        table["139"]["scores"], np.asarray([0.75], np.float32)
    )
