"""ctypes bindings for the native C++ data-loading runtime (native/dataloader.cc).

Provides a GIL-free threaded JPEG-decode + resize + canvas-fill path used by the
host loaders when the shared library is available (built by ``make -C native``);
falls back to the pure-Python PIL path otherwise.  This replaces the torch
DataLoader worker processes the reference relies on (DATALOADER.NUM_WORKERS,
/root/reference/data/build.py loaders; SURVEY.md §2.6).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libunit_native.so"),
]


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.prepare_batch.restype = ctypes.c_int
            lib.prepare_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.decode_image_size.restype = ctypes.c_int
            lib.decode_image_size.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            if hasattr(lib, "prepare_image"):
                lib.prepare_image.restype = ctypes.c_int
                lib.prepare_image.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                ]
            if hasattr(lib, "decode_image_size_mem"):
                lib.decode_image_size_mem.restype = ctypes.c_int
                lib.decode_image_size_mem.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ]
            if hasattr(lib, "prepare_image_mem"):
                lib.prepare_image_mem.restype = ctypes.c_int
                lib.prepare_image_mem.argtypes = [
                    ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                ]
            _LIB = lib
            return lib
    return None


def available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "prepare_image")


def prepare_image_native(
    path: str,
    min_size: int,
    max_size: int,
    canvas: Tuple[int, int],
    flip: bool = False,
):
    """Decode+resize(+flip)+canvas-fill ONE image fully in C (GIL released).

    Returns (image [H, W, 3] BGR float32, (new_h, new_w), scale); raises
    RuntimeError on decode failure (caller falls back to the PIL path)."""
    lib = load_library()
    assert lib is not None and hasattr(lib, "prepare_image")
    ch, cw = canvas
    image = np.zeros((ch, cw, 3), np.float32)
    size = np.zeros((2,), np.float32)
    scale = np.zeros((1,), np.float32)
    rc = lib.prepare_image(
        path.encode(), min_size, max_size, ch, cw, int(flip),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc:
        raise RuntimeError(f"native decode failed for {path}")
    return image, (int(size[0]), int(size[1])), float(scale[0])


def decode_image_size_mem_native(data: bytes) -> Tuple[int, int]:
    """Header-only (h, w) of an in-memory JPEG; raises RuntimeError if it is
    not parseable JPEG (caller falls back to PIL)."""
    lib = load_library()
    assert lib is not None and hasattr(lib, "decode_image_size_mem")
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    if lib.decode_image_size_mem(data, len(data), ctypes.byref(h), ctypes.byref(w)):
        raise RuntimeError("not a decodable JPEG header")
    return int(h.value), int(w.value)


def prepare_image_mem_native(
    data: bytes,
    min_size: int,
    max_size: int,
    canvas: Tuple[int, int],
    flip: bool = False,
):
    """Decode+resize an IN-MEMORY JPEG fully in C (GIL released).

    The serving path (unit_tpu/serving/server.py): request bytes never touch
    disk.  Returns (image [H, W, 3] BGR float32, (new_h, new_w), scale,
    (orig_h, orig_w)); raises RuntimeError on decode failure (caller falls
    back to the PIL path, e.g. for PNG input)."""
    lib = load_library()
    assert lib is not None and hasattr(lib, "prepare_image_mem")
    ch, cw = canvas
    image = np.zeros((ch, cw, 3), np.float32)
    size = np.zeros((2,), np.float32)
    scale = np.zeros((1,), np.float32)
    orig = np.zeros((2,), np.float32)
    rc = lib.prepare_image_mem(
        data, len(data), min_size, max_size, ch, cw, int(flip),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc:
        raise RuntimeError("native in-memory decode failed")
    return (
        image, (int(size[0]), int(size[1])), float(scale[0]),
        (int(orig[0]), int(orig[1])),
    )


def prepare_batch_native(
    paths: List[str],
    min_size: int,
    max_size: int,
    canvas: Tuple[int, int],
    n_threads: int = 8,
):
    """Decode+resize a batch of JPEGs into fixed-canvas BGR float32 arrays.

    Returns (images [N, H, W, 3], sizes [N, 2], scales [N]); raises RuntimeError
    if any file fails to decode.
    """
    lib = load_library()
    assert lib is not None, "native library not built (make -C native)"
    n = len(paths)
    ch, cw = canvas
    images = np.zeros((n, ch, cw, 3), np.float32)
    sizes = np.zeros((n, 2), np.float32)
    scales = np.zeros((n,), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    errs = lib.prepare_batch(
        arr, n, min_size, max_size, ch, cw,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if errs:
        raise RuntimeError(f"native batch decode failed for {errs}/{n} images")
    return images, sizes, scales
