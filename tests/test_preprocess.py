"""Offline preprocessing tests: breast crop heuristic, box remap, shard writer, and
native C++ parity vs the numpy/cv2 implementations."""

import numpy as np
import pandas as pd
import pytest

from mammo_clip_tpu.data.images import PackedShardStore
from mammo_clip_tpu.preprocess.breast_crop import (
    breast_roi_bounds,
    extract_breast_roi,
    normalize_dicom_pixels,
    remap_boxes,
)
from mammo_clip_tpu.preprocess.shard_writer import write_packed_shards


def _synthetic_mammogram(h=200, w=160, side="left"):
    """Black background + a bright half-ellipse 'breast' on one side."""
    rng = np.random.default_rng(0)
    img = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    cx = 0 if side == "left" else w - 1
    mask = ((xx - cx) / (w * 0.5)) ** 2 + ((yy - h / 2) / (h * 0.45)) ** 2 < 1
    img[mask] = 100 + (rng.integers(0, 100, mask.sum())).astype(np.uint8)
    return img


def test_breast_roi_finds_breast_side():
    img = _synthetic_mammogram(side="left")
    y0, y1, x0, x1 = breast_roi_bounds(img)
    assert x0 == 0 and x1 < img.shape[1]  # crop removes empty right side
    crop = extract_breast_roi(img)
    assert crop.shape[0] <= img.shape[0] and crop.shape[1] < img.shape[1]
    assert crop.mean() > img.mean()  # mostly breast now


def test_remap_boxes():
    boxes = np.asarray([[100.0, 100.0, 200.0, 300.0]])
    out = remap_boxes(boxes, crop_bounds=(50, 450, 80, 480), out_size=(800, 400))
    # scale: x (480-80=400 -> 400) = 1.0, y (450-50=400 -> 800) = 2.0
    np.testing.assert_allclose(out, [[20.0, 100.0, 120.0, 500.0]])


def test_normalize_dicom_pixels_monochrome1():
    data = np.arange(400, dtype=np.uint16).reshape(20, 20)
    out = normalize_dicom_pixels(data, "MONOCHROME1", trim=2)
    assert out.dtype == np.uint8
    assert out[0, 0] == 255  # inverted
    assert out.min() == 0 and out.max() == 255


def test_shard_writer_roundtrip(tmp_path):
    h, w = 32, 24
    rng = np.random.default_rng(1)
    images = {f"img{i}": rng.integers(0, 255, (h, w), dtype=np.uint8) for i in range(7)}

    def loader(path):
        return images[path]

    idx = write_packed_shards(
        [(k, k) for k in images], str(tmp_path), (h, w), shard_size=3, loader=loader
    )
    assert len(idx) == 7
    assert idx.shard.max() == 2  # 3+3+1
    store = PackedShardStore(str(tmp_path))
    for k, v in images.items():
        np.testing.assert_array_equal(store.get("", k), v)


# ------------------------------------------------------------------ native parity


@pytest.fixture(scope="module")
def native():
    from mammo_clip_tpu.preprocess import native_bindings as nb

    if not nb.native_available():
        pytest.skip("no C++ toolchain")
    return nb


def test_native_breast_crop_matches_numpy(native):
    img = _synthetic_mammogram(side="right")
    assert native.breast_crop_bounds_native(img) == breast_roi_bounds(img)
    img2 = _synthetic_mammogram(side="left")
    assert native.breast_crop_bounds_native(img2) == breast_roi_bounds(img2)


def test_native_area_resize_matches_cv2(native):
    import cv2

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (97, 61), dtype=np.uint8)
    ours = native.area_resize_native(img, (48, 30))
    ref = cv2.resize(img, (30, 48), interpolation=cv2.INTER_AREA)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # rounding-only differences


def test_native_fused_preprocess(native):
    raw = (_synthetic_mammogram(side="left").astype(np.uint16)) * 257
    out, bounds = native.preprocess_mammogram_native(raw, (152, 91))
    assert out.shape == (152, 91)
    assert out.max() > 100
    y0, y1, x0, x1 = bounds
    assert x0 == 0 and x1 < raw.shape[1]
