"""ctypes bindings for the native preprocessing library (preprocess/native/).

Auto-builds the shared library on first use (g++ is in the image; pybind11 is not,
so the C ABI + ctypes is the binding layer). Falls back to None when no compiler is
available; callers use the numpy implementations in breast_crop.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmammo_native.so"
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.normalize_u16_to_u8.argtypes = [u16p, ctypes.c_int64, ctypes.c_int, u8p]
    lib.breast_crop_bounds.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.area_resize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int]
    lib.preprocess_mammogram_u16.argtypes = [
        u16p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int, i32p,
    ]
    lib.clahe_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, ctypes.c_float, u8p]
    _lib = lib
    return lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_available() -> bool:
    return load_native() is not None


def breast_crop_bounds_native(img: np.ndarray, threshold: int = 40) -> Tuple[int, int, int, int]:
    lib = load_native()
    assert lib is not None and img.dtype == np.uint8 and img.flags["C_CONTIGUOUS"]
    out = np.zeros(4, np.int32)
    lib.breast_crop_bounds(_ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
                           threshold, _ptr(out, ctypes.c_int32))
    return tuple(int(v) for v in out)


def area_resize_native(img: np.ndarray, out_size: Tuple[int, int]) -> np.ndarray:
    lib = load_native()
    assert lib is not None and img.dtype == np.uint8
    img = np.ascontiguousarray(img)
    dh, dw = out_size
    out = np.zeros((dh, dw), np.uint8)
    lib.area_resize_u8(_ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
                       _ptr(out, ctypes.c_uint8), dh, dw)
    return out


def preprocess_mammogram_native(
    raw_u16: np.ndarray, out_size: Tuple[int, int], invert: bool = False,
    crop_threshold: int = 40,
) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Fused normalize -> breast crop -> area resize; returns (uint8 image, bounds)."""
    lib = load_native()
    assert lib is not None and raw_u16.dtype == np.uint16
    raw_u16 = np.ascontiguousarray(raw_u16)
    dh, dw = out_size
    out = np.zeros((dh, dw), np.uint8)
    bounds = np.zeros(4, np.int32)
    lib.preprocess_mammogram_u16(
        _ptr(raw_u16, ctypes.c_uint16), raw_u16.shape[0], raw_u16.shape[1],
        int(invert), crop_threshold, _ptr(out, ctypes.c_uint8), dh, dw,
        _ptr(bounds, ctypes.c_int32),
    )
    return out, tuple(int(v) for v in bounds)


def clahe_native(img: np.ndarray, tiles: Tuple[int, int] = (8, 8),
                 clip_limit: float = 2.0) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization (parity with cv2 CLAHE
    within +-1 gray level)."""
    lib = load_native()
    assert lib is not None and img.dtype == np.uint8 and img.ndim == 2
    img = np.ascontiguousarray(img)
    out = np.zeros_like(img)
    lib.clahe_u8(_ptr(img, ctypes.c_uint8), img.shape[0], img.shape[1],
                 tiles[0], tiles[1], clip_limit, _ptr(out, ctypes.c_uint8))
    return out
