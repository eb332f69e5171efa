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
