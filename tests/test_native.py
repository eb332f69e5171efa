"""Native C++ dataloader: decode+resize parity with the Python path."""

import os
import subprocess

import numpy as np
import pytest

from unit_tpu.data import native as native_mod

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def native_lib():
    if not native_mod.available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=False, capture_output=True)
    if not native_mod.available():
        pytest.skip("native library not buildable here")
    return native_mod.load_library()


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (90, 200), (300, 100)]):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(d / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_prepare_batch_shapes_and_scale(native_lib, jpeg_files):
    images, sizes, scales = native_mod.prepare_batch_native(
        jpeg_files, min_size=96, max_size=160, canvas=(128, 192), n_threads=2
    )
    assert images.shape == (3, 128, 192, 3)
    # shortest edge -> 96 (or capped by max_size)
    for i, (h, w) in enumerate([(120, 160), (90, 200), (300, 100)]):
        scale = 96 / min(h, w)
        if max(h, w) * scale > 160:
            scale = 160 / max(h, w)
        assert abs(scales[i] - scale) < 1e-5
        # resized size, clamped to the canvas
        assert abs(sizes[i, 0] - min(round(h * scale), 128)) <= 1
        assert abs(sizes[i, 1] - min(round(w * scale), 192)) <= 1


def test_native_matches_python_resize(native_lib, jpeg_files):
    from PIL import Image
    from unit_tpu.data.transforms import resize_image, resize_shortest_edge

    images, sizes, scales = native_mod.prepare_batch_native(
        jpeg_files[:1], min_size=96, max_size=160, canvas=(128, 192), n_threads=1
    )
    with Image.open(jpeg_files[0]) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.float32)
    bgr = rgb[:, :, ::-1]
    nh, nw, _ = resize_shortest_edge(rgb.shape[0], rgb.shape[1], 96, 160)
    want = resize_image(bgr, nh, nw)
    got = images[0, :nh, :nw]
    # bilinear implementations agree closely
    assert np.abs(got - want).mean() < 1.0
    # padding stays zero
    assert np.all(images[0, nh:] == 0)


def test_padding_region_zero(native_lib, jpeg_files):
    images, sizes, _ = native_mod.prepare_batch_native(
        jpeg_files, min_size=64, max_size=96, canvas=(128, 192), n_threads=3
    )
    for i in range(3):
        nh, nw = int(sizes[i, 0]), int(sizes[i, 1])
        assert np.all(images[i, nh:, :] == 0)
        assert np.all(images[i, :, nw:] == 0)
        assert images[i, :nh, :nw].max() > 0


def test_prepare_image_matches_python_flip(native_lib, jpeg_files):
    """prepare_image (train-path single-image prep incl. flip) matches the
    Python decode+resize+flip+canvas pipeline."""
    from PIL import Image
    from unit_tpu.data.transforms import resize_image, resize_shortest_edge

    path = jpeg_files[0]
    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.float32)
    bgr = rgb[:, :, ::-1]
    h, w = bgr.shape[:2]
    for flip in (False, True):
        img, (nh, nw), scale = native_mod.prepare_image_native(
            path, 96, 160, (128, 192), flip=flip
        )
        eh, ew, escale = resize_shortest_edge(h, w, 96, 160)
        assert (nh, nw) == (min(eh, 128), min(ew, 192))
        assert abs(scale - escale) < 1e-6
        ref = resize_image(bgr, nh, nw)
        if flip:
            ref = ref[:, ::-1]
        np.testing.assert_allclose(img[:nh, :nw], ref, atol=1.0)
        # padding region stays zero
        assert np.all(img[nh:] == 0) and np.all(img[:, nw:] == 0)


def test_stream_loader_uses_native_path(native_lib, jpeg_files, tmp_path):
    """A StreamLoader over real JPEG records takes the native prep path and
    produces the same batch structure as the Python path."""
    from PIL import Image
    from unit_tpu.data.loader import StreamLoader, _native_eligible
    from unit_tpu.data.transforms import TransformConfig

    recs = []
    for i, p in enumerate(jpeg_files):
        with Image.open(p) as im:
            w, h = im.size
        recs.append({
            "image_id": f"im{i}", "file_name": p, "height": h, "width": w,
            "annotations": [
                {"category_id": 1, "bbox": [5.0, 5.0, 40.0, 40.0]},
            ],
        })
    assert _native_eligible(recs[0])
    tcfg = TransformConfig(min_sizes=(96,), max_size=160, canvas=(128, 192),
                           max_gt=5, num_classes=3)
    loader = StreamLoader(recs, tcfg, batch_size=2,
                          keys=("image", "image_size", "gt_boxes", "gt_valid",
                                "labels"), seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 2 and batch["image"].dtype == np.float32
    assert batch["gt_valid"].any() and np.isfinite(batch["image"]).all()
    # GT got scaled into network-input coordinates
    valid_boxes = batch["gt_boxes"][batch["gt_valid"]]
    assert (valid_boxes[:, 2] <= 192).all() and (valid_boxes >= 0).all()


def test_resize_rounding_matches_python_on_ties(native_lib, tmp_path):
    """Half-integer resized dims must round like Python round() (half to
    even), not lround (half away from zero): 25x24 at min_size 12 scales by
    exactly 0.5 -> 12.5, which Python rounds to 12."""
    from PIL import Image

    from unit_tpu.data.transforms import resize_shortest_edge

    h, w = 25, 24
    p = str(tmp_path / "tie.jpg")
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(p, quality=95)
    exp_h, exp_w, _ = resize_shortest_edge(h, w, 12, 100)
    assert (exp_h, exp_w) == (12, 12)  # the tie actually exercises banker's
    image, (nh, nw), scale = native_mod.prepare_image_native(
        p, 12, 100, (32, 32)
    )
    assert (nh, nw) == (exp_h, exp_w)
