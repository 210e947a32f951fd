"""ctypes bindings for the native DICOM codec (preprocess/native/mammo_dicom.cpp).

First-party pixel decode for the offline conversion tool: JPEG-2000 lossless (the
RSNA mammography transfer syntax — reference decoded it with NVIDIA DALI,
preprocess_image_to_png_kaggle.py:95-100), JPEG Lossless process 14 SV1 (VinDr —
reference used dicomsdl, preprocess_image_to_png_vindr.py:80-88), JPEG-LS, and
uncompressed syntaxes. ``write_dicom_u16`` is the test-fixture encoder.

Auto-builds against the system GDCM 3.0 on first use; ``dicom_available()`` gates
callers (pydicom remains a fallback in dicom_tool.read_dicom_pixels).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmammo_dicom.so"
_lib: Optional[ctypes.CDLL] = None

_STATUS = {0: "ok", 1: "read failed", 2: "unsupported format", 3: "buffer mismatch",
           4: "write failed"}


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR), "libmammo_dicom.so"],
                       check=True, capture_output=True)
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_dicom_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.dicom_image_info.argtypes = [ctypes.c_char_p, i64p, i64p, i32p, i32p, i32p]
    lib.dicom_read_u16.argtypes = [ctypes.c_char_p, u16p, ctypes.c_int64]
    lib.dicom_write_u16.argtypes = [ctypes.c_char_p, u16p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def dicom_available() -> bool:
    return load_dicom_native() is not None


def read_dicom_u16(path: str) -> Tuple[np.ndarray, bool]:
    """Decode a DICOM file -> (uint16 pixel array (H, W), monochrome1 flag).

    8-bit pixels are widened; signed 16-bit is shifted +32768 (order-preserving,
    harmless under the per-image min-max normalization that follows)."""
    lib = load_dicom_native()
    assert lib is not None, "native DICOM codec unavailable (GDCM not found?)"
    rows, cols = ctypes.c_int64(), ctypes.c_int64()
    bits, sgn, mono1 = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.dicom_image_info(path.encode(), ctypes.byref(rows), ctypes.byref(cols),
                              ctypes.byref(bits), ctypes.byref(sgn), ctypes.byref(mono1))
    if rc != 0:
        raise ValueError(f"DICOM info failed for {path}: {_STATUS.get(rc, rc)}")
    out = np.empty((rows.value, cols.value), np.uint16)
    rc = lib.dicom_read_u16(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                            out.size)
    if rc != 0:
        raise ValueError(f"DICOM decode failed for {path}: {_STATUS.get(rc, rc)}")
    return out, bool(mono1.value)


# transfer-syntax codes understood by dicom_write_u16 (test-fixture encoder)
TS_RAW = 0  # explicit-VR little-endian
TS_J2K = 1  # JPEG-2000 lossless (RSNA)
TS_JLS = 2  # JPEG-LS lossless
TS_JPEG_LOSSLESS = 3  # JPEG lossless process 14 SV1 (VinDr)


def write_dicom_u16(path: str, pixels: np.ndarray, ts: int = TS_RAW,
                    monochrome1: bool = False) -> None:
    """Encode a uint16 image as a DICOM file (fixture generator for tests)."""
    lib = load_dicom_native()
    assert lib is not None, "native DICOM codec unavailable (GDCM not found?)"
    pixels = np.ascontiguousarray(pixels, np.uint16)
    assert pixels.ndim == 2
    rc = lib.dicom_write_u16(path.encode(),
                             pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                             pixels.shape[0], pixels.shape[1], int(ts), int(monochrome1))
    if rc != 0:
        raise ValueError(f"DICOM encode failed for {path}: {_STATUS.get(rc, rc)}")
