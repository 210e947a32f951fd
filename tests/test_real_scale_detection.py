"""Geometry/annotation contract of the real-scale detection-transfer data
generator (benchmarks/real_scale_detection.py). The TPU arms consume these
boxes as focal-loss targets and mAP ground truth — wrong geometry would make
the transfer table silently meaningless."""

import numpy as np


def test_detection_set_boxes_match_painted_shapes():
    from benchmarks.real_scale_detection import H, PATCH, W, make_detection_set

    imgs, anns = make_detection_set(24, seed=3)
    assert imgs.shape == (24, H, W, 1) and imgs.dtype == np.uint8
    assert anns.shape == (24, 16, 5)
    n_boxes = 0
    for i in range(24):
        valid = anns[i][anns[i, :, 4] >= 0]
        assert 1 <= len(valid) <= 2
        n_boxes += len(valid)
        for x1, y1, x2, y2, cls in valid:
            assert 0 <= x1 < x2 <= W and 0 <= y1 < y2 <= H
            assert x2 - x1 == PATCH and y2 - y1 == PATCH
            assert cls in (0.0, 1.0, 2.0)
            # the shape is painted: inside-box mean exceeds the background's
            inside = imgs[i, int(y1):int(y2), int(x1):int(x2), 0].astype(np.float64)
            outside_mean = 29.5  # E[U(0,60)]
            assert inside.mean() > outside_mean + 2.0
        # two boxes never overlap (disjoint halves by construction)
        if len(valid) == 2:
            (ax1, ay1, ax2, ay2, _), (bx1, by1, bx2, by2, _) = valid
            ix = max(0, min(ax2, bx2) - max(ax1, bx1))
            iy = max(0, min(ay2, by2) - max(ay1, by1))
            assert ix * iy == 0.0
    assert n_boxes > 24  # the 1-or-2 draw actually produces 2-box images


def test_detection_set_is_seeded_and_distinct():
    from benchmarks.real_scale_detection import make_detection_set

    a1, n1 = make_detection_set(4, seed=5)
    a2, n2 = make_detection_set(4, seed=5)
    b, nb = make_detection_set(4, seed=6)
    assert np.array_equal(a1, a2) and np.array_equal(n1, n2)
    assert not np.array_equal(a1, b)
