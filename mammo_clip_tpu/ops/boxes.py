"""Box utilities: IoU, RetinaNet box coding, anchor generation. All shape-static.

Parity targets:
* anchor lattice (reference: Detectors/retinanet/anchors.py:8-135): pyramid levels
  3..7, strides 2^l, base sizes 2^(l+2), ratios {0.5,1,2}, scales {1,2^1/3,2^2/3},
  centers at (stride*(i+0.5)); generated ONCE per static image shape on host numpy —
  the reference regenerates them every forward (anchors.py:25-45), flagged in
  SURVEY.md §7 as a fix;
* box deltas normalized by std [0.1,0.1,0.2,0.2] (losses.py:142-162,
  detectors_utils.py BBoxTransform);
* IoU (calc_iou, losses.py:5-30).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

BOX_STD = np.asarray([0.1, 0.1, 0.2, 0.2], np.float32)


def generate_level_anchors(base_size: float, ratios: Sequence[float], scales: Sequence[float]) -> np.ndarray:
    """(num_ratios*num_scales, 4) anchors centered at origin, xyxy."""
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray(scales, np.float64)
    ws = base_size * np.tile(scales, len(ratios))
    areas = ws * ws
    r = np.repeat(ratios, len(scales))
    w = np.sqrt(areas / r)
    h = w * r
    return np.stack([-w / 2, -h / 2, w / 2, h / 2], axis=1).astype(np.float32)


def build_anchors(
    image_shape: Tuple[int, int],
    pyramid_levels: Sequence[int] = (3, 4, 5, 6, 7),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (1.0, 2 ** (1 / 3), 2 ** (2 / 3)),
) -> np.ndarray:
    """All anchors for a static (H, W), concatenated over levels -> (A, 4) xyxy."""
    H, W = image_shape
    out: List[np.ndarray] = []
    for lvl in pyramid_levels:
        stride = 2**lvl
        base = 2 ** (lvl + 2)
        cell = generate_level_anchors(base, ratios, scales)
        fh = -(-H // stride)
        fw = -(-W // stride)
        sx = (np.arange(fw) + 0.5) * stride
        sy = (np.arange(fh) + 0.5) * stride
        cx, cy = np.meshgrid(sx, sy)
        shifts = np.stack([cx.ravel(), cy.ravel(), cx.ravel(), cy.ravel()], axis=1)
        out.append((shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4).astype(np.float32))
    return np.concatenate(out, axis=0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (A,4) and (B,4) xyxy boxes -> (A,B)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.clip(union, 1e-8, None)


def encode_boxes(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """xyxy anchors + matched gt -> normalized (dx,dy,dw,dh) targets."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    # centers from the UNCLAMPED extents, clamp only the log's w/h — the
    # reference computes centers first and clamps afterwards
    # (detectors_utils/losses: degenerate border-clipped boxes keep their true
    # center; clamping first would shift it by 0.5px)
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    gx = gt[:, 0] + 0.5 * gw
    gy = gt[:, 1] + 0.5 * gh
    gw = jnp.clip(gw, 1.0, None)
    gh = jnp.clip(gh, 1.0, None)
    d = jnp.stack(
        [(gx - ax) / aw, (gy - ay) / ah, jnp.log(gw / aw), jnp.log(gh / ah)], axis=1
    )
    return d / BOX_STD[None, :]


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_boxes (reference BBoxTransform, detectors_utils.py:162-222)."""
    d = deltas * BOX_STD[None, :]
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    cx = ax + d[:, 0] * aw
    cy = ay + d[:, 1] * ah
    w = jnp.exp(d[:, 2]) * aw
    h = jnp.exp(d[:, 3]) * ah
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=1)


def clip_boxes(boxes: jnp.ndarray, image_shape: Tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy to image bounds (reference ClipBoxes, detectors_utils.py:225-252)."""
    H, W = image_shape
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, W - 1),
            jnp.clip(boxes[..., 1], 0, H - 1),
            jnp.clip(boxes[..., 2], 0, W - 1),
            jnp.clip(boxes[..., 3], 0, H - 1),
        ],
        axis=-1,
    )
