"""ctypes bindings for the native C++ image loader (native/imgloader.cpp).

Provides multithreaded JPEG/PNG decode+resize into preallocated numpy
batches — the framework's native host-IO path (the reference depends on
Pillow/OpenCV native code for the same job, SURVEY.md §2.10). Builds
lazily with ``make -C native`` on first use; every caller must handle
``available() == False`` and fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libimgloader.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.imgloader_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.imgloader_decode.restype = ctypes.c_int
    lib.imgloader_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.imgloader_decode_batch.restype = ctypes.c_int
    lib.imgloader_grid_crop.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.imgloader_band_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.imgloader_band_size.restype = ctypes.c_int
    lib.imgloader_read_band.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.imgloader_read_band.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Decode one image to (out_h, out_w, 3) uint8, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.imgloader_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
    )
    return out if rc == 0 else None


def decode_batch(
    paths: Sequence[str], out_h: int, out_w: int, n_threads: int = 8
) -> Optional[np.ndarray]:
    """Decode many images to (N, out_h, out_w, 3) uint8 with a native thread
    pool; None if the native lib is unavailable or any file failed."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.imgloader_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, n_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out if failures == 0 else None


def read_band(path: str, band: int = 1) -> Optional[np.ndarray]:
    """Read one band (1-indexed) of a TIFF as raw float32 DN values
    (H, W) — the rasterio-free multispectral path (Sentinel-2 uint16
    GeoTIFFs; reference reads these with ``rasterio.open(p).read(b)``,
    ``dino_dataset.py:73-87``). None on failure."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.imgloader_band_size(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.imgloader_read_band(
        path.encode(), band, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
    )
    return out if rc == 0 else None


def grid_crop(img: np.ndarray, rows: int, cols: int) -> Optional[np.ndarray]:
    """(H, W, 3) uint8 -> (rows*cols, H//rows, W//cols, 3) via native memcpy."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    th, tw = h // rows, w // cols
    out = np.empty((rows * cols, th, tw, 3), np.uint8)
    lib.imgloader_grid_crop(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
