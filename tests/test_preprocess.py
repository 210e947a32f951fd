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


# ------------------------------------------------------------------ native DICOM codec


@pytest.fixture(scope="module")
def dicom_native():
    from mammo_clip_tpu.preprocess import dicom_native as dn

    if not dn.dicom_available():
        pytest.skip("no GDCM toolchain")
    return dn


def test_dicom_roundtrip_all_dataset_syntaxes(dicom_native, tmp_path):
    """Encode->decode is bit-exact in every transfer syntax the datasets use:
    JPEG-2000 lossless (RSNA — reference used DALI), JPEG Lossless process 14 SV1
    (VinDr — reference used dicomsdl), JPEG-LS, and uncompressed."""
    dn = dicom_native
    rng = np.random.default_rng(1)
    img = rng.integers(0, 4096, (120, 90)).astype(np.uint16)
    for ts in (dn.TS_RAW, dn.TS_J2K, dn.TS_JLS, dn.TS_JPEG_LOSSLESS):
        for mono1 in (False, True):
            p = str(tmp_path / f"t{ts}_{mono1}.dcm")
            dn.write_dicom_u16(p, img, ts=ts, monochrome1=mono1)
            out, got_mono1 = dn.read_dicom_u16(p)
            np.testing.assert_array_equal(out, img)
            assert got_mono1 == mono1


def test_dicom_tool_end_to_end_without_pydicom(dicom_native, tmp_path):
    """The L0 entry point: J2K/JPEG-lossless DICOMs -> packed uint8 shards via the
    native decode + fused native preprocess, no pydicom anywhere."""
    import sys

    assert "pydicom" not in sys.modules
    dn = dicom_native
    from mammo_clip_tpu.preprocess import dicom_tool

    in_dir = tmp_path / "dicoms"
    in_dir.mkdir()
    base = _synthetic_mammogram(h=200, w=160, side="left").astype(np.uint16) * 257
    dn.write_dicom_u16(str(in_dir / "rsna_case.dicom"), base, ts=dn.TS_J2K)
    dn.write_dicom_u16(str(in_dir / "vindr_case.dicom"), base, ts=dn.TS_JPEG_LOSSLESS,
                       monochrome1=True)

    out_dir = tmp_path / "shards"
    bounds_csv = tmp_path / "bounds.csv"
    dicom_tool.main([
        "--in-dir", str(in_dir), "--out-dir", str(out_dir),
        "--height", "152", "--width", "91", "--bounds-csv", str(bounds_csv),
    ])

    store = PackedShardStore(str(out_dir))
    a = store.get("", "rsna_case")
    b = store.get("", "vindr_case")
    assert a.shape == (152, 91) and b.shape == (152, 91)
    assert a.max() > 100  # breast pixels survived the crop+resize
    # MONOCHROME1 is inverted relative to MONOCHROME2 of the same raw pixels:
    # after min-max normalization the two should be (approximately) complementary
    interior = np.abs(a.astype(int) + b.astype(int) - 255)
    assert np.median(interior) <= 2
    rows = pd.read_csv(bounds_csv)
    assert set(rows["image_id"]) == {"rsna_case", "vindr_case"}


def test_dicom_pool_matches_serial_path(dicom_native, tmp_path):
    """The parallel C++ decode+preprocess pool (mammo_pool.cpp — the DALI-stage
    equivalent) is byte-identical to dicom_tool.convert_one's serial native path,
    across transfer syntaxes, MONOCHROME1, and thread counts; bad files report
    per-file status without poisoning the batch."""
    dn = dicom_native
    if not dn.pool_available():
        pytest.skip("pool lib unavailable")
    from mammo_clip_tpu.preprocess import dicom_tool

    rng = np.random.default_rng(5)
    paths = []
    for i, (ts, mono1) in enumerate([
        (dn.TS_J2K, False), (dn.TS_JPEG_LOSSLESS, True), (dn.TS_JLS, False),
        (dn.TS_RAW, True), (dn.TS_J2K, True), (dn.TS_RAW, False),
    ]):
        base = _synthetic_mammogram(h=140 + 4 * i, w=100 + 4 * i, side="left")
        img = base.astype(np.uint16) * 257 + rng.integers(0, 256, base.shape).astype(np.uint16)
        p = str(tmp_path / f"case{i}.dicom")
        dn.write_dicom_u16(p, img, ts=ts, monochrome1=mono1)
        paths.append(p)

    out_size = (96, 64)
    serial = [dicom_tool.convert_one(p, out_size) for p in paths]
    for n_threads in (1, 4):
        imgs, bounds, status = dn.batch_preprocess(paths, out_size, n_threads=n_threads)
        assert status.tolist() == [0] * len(paths)
        for i in range(len(paths)):
            np.testing.assert_array_equal(imgs[i], serial[i][0])
            assert tuple(bounds[i]) == tuple(serial[i][1])

    # a corrupt file fails alone: others still convert
    bad = str(tmp_path / "broken.dicom")
    with open(bad, "wb") as f:
        f.write(b"not a dicom at all")
    imgs, _, status = dn.batch_preprocess([paths[0], bad, paths[1]], out_size, n_threads=2)
    assert status[0] == 0 and status[2] == 0 and status[1] != 0
    np.testing.assert_array_equal(imgs[0], serial[0][0])
    np.testing.assert_array_equal(imgs[2], serial[1][0])


def test_dicom_tool_uses_pool(dicom_native, tmp_path, monkeypatch):
    """dicom_tool --threads 0 routes through the parallel pool and produces the
    same shards + bounds CSV as the serial --threads 1 path."""
    dn = dicom_native
    if not dn.pool_available():
        pytest.skip("pool lib unavailable")
    import pandas as _pd

    from mammo_clip_tpu.preprocess import dicom_tool

    in_dir = tmp_path / "d"
    in_dir.mkdir()
    base = _synthetic_mammogram(h=150, w=110, side="left").astype(np.uint16) * 257
    for i in range(5):
        dn.write_dicom_u16(str(in_dir / f"img{i}.dicom"), base + i, ts=dn.TS_J2K)

    outs = {}
    for threads in ("0", "1"):
        out_dir = tmp_path / f"shards{threads}"
        csv = tmp_path / f"b{threads}.csv"
        dicom_tool.main(["--in-dir", str(in_dir), "--out-dir", str(out_dir),
                         "--height", "80", "--width", "56",
                         "--threads", threads, "--bounds-csv", str(csv)])
        store = PackedShardStore(str(out_dir))
        outs[threads] = (store.get_rows([f"img{i}" for i in range(5)]),
                         _pd.read_csv(csv).sort_values("image_id").reset_index(drop=True))
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    _pd.testing.assert_frame_equal(outs["0"][1], outs["1"][1])


def test_native_clahe_matches_cv2(native):
    import cv2

    rng = np.random.default_rng(3)
    img = np.ascontiguousarray(rng.normal(120, 30, (256, 192)).clip(0, 255).astype(np.uint8))
    ours = native.clahe_native(img, tiles=(8, 8), clip_limit=2.0)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # rounding-only differences
    # and it actually equalizes: output histogram is flatter than the input's
    assert np.std(np.bincount(ours.ravel(), minlength=256)) < np.std(
        np.bincount(img.ravel(), minlength=256))
