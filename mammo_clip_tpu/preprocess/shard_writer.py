"""Packed-shard writer: PNG/DICOM trees -> fixed-shape uint8 shards + index.

Replaces the reference's PNG-per-file dataset layout (consumed one cv2.imread at a
time, imagetext.py:124) with TPU-host-friendly packed arrays: each shard is an
(N, H, W) uint8 .npy read back via memmap by data.images.PackedShardStore, so a batch
fetch is a few sequential memcpys with zero decode.

The heavy lifting (image decode + breast crop + area resize) can run through the
native C++ tool (preprocess/native/, built with ctypes bindings) when available, and
falls back to cv2 otherwise.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Iterable, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from .breast_crop import extract_breast_roi


def default_image_loader(path: str, image_size: Tuple[int, int], crop: bool = False):
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    if crop:
        img = extract_breast_roi(img)
    h, w = image_size
    if img.shape != (h, w):
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    return img


def write_packed_shards(
    image_paths: Sequence[Tuple[str, str]],  # (image_id, path)
    out_dir: str,
    image_size: Tuple[int, int],
    shard_size: int = 1024,
    crop: bool = False,
    loader: Optional[Callable] = None,
) -> pd.DataFrame:
    """Write shards + index.csv; returns the index dataframe."""
    loader = loader or (lambda p: default_image_loader(p, image_size, crop))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    h, w = image_size
    rows = []
    shard_idx = 0
    buf = np.zeros((min(shard_size, len(image_paths)), h, w), np.uint8)
    n_in_buf = 0
    for image_id, path in image_paths:
        buf[n_in_buf] = loader(path)
        rows.append({"image_id": str(image_id), "shard": shard_idx, "row": n_in_buf})
        n_in_buf += 1
        if n_in_buf == buf.shape[0]:
            np.save(out / f"shard_{shard_idx:05d}.npy", buf[:n_in_buf])
            shard_idx += 1
            remaining = len(image_paths) - len(rows)
            buf = np.zeros((min(shard_size, max(remaining, 1)), h, w), np.uint8)
            n_in_buf = 0
    if n_in_buf:
        np.save(out / f"shard_{shard_idx:05d}.npy", buf[:n_in_buf])
    index = pd.DataFrame(rows)
    index.to_csv(out / "index.csv", index=False)
    return index
