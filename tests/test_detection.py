"""Detection stack tests: anchors, box coding, static NMS, focal loss, RetinaNet
shapes, and mAP evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammo_clip_tpu.downstream.detect import _voc_ap, evaluate_map
from mammo_clip_tpu.losses.focal import focal_loss
from mammo_clip_tpu.models.retinanet import RetinaNet, anchors_for, detect
from mammo_clip_tpu.ops.boxes import (
    box_iou,
    build_anchors,
    clip_boxes,
    decode_boxes,
    encode_boxes,
)
from mammo_clip_tpu.ops.nms import batched_class_nms, static_nms


# ------------------------------------------------------------------ anchors / boxes


def test_anchor_count_matches_reference_lattice():
    """A = sum over levels of ceil(H/s)*ceil(W/s)*9 (reference anchors.py:25-45)."""
    H, W = 128, 96
    anchors = build_anchors((H, W))
    expected = sum(
        -(-H // 2**l) * (-(-W // 2**l)) * 9 for l in range(3, 8)
    )
    assert anchors.shape == (expected, 4)
    # level-3 anchors: base size 32, first center at stride*0.5=4
    a0 = anchors[:9]
    areas = (a0[:, 2] - a0[:, 0]) * (a0[:, 3] - a0[:, 1])
    np.testing.assert_allclose(areas[0], 32 * 32, rtol=1e-5)
    centers = (a0[:, :2] + a0[:, 2:]) / 2
    np.testing.assert_allclose(centers, 4.0, atol=1e-4)


def test_box_iou_known_values():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-5)


def test_box_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(build_anchors((64, 64))[::37][:20])
    gt = []
    for _ in range(20):
        x1, y1 = rng.uniform(0, 30, 2)
        w, h = rng.uniform(5, 30, 2)
        gt.append([x1, y1, x1 + w, y1 + h])
    gt = jnp.asarray(gt, jnp.float32)
    deltas = encode_boxes(anchors, gt)
    rec = decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-3)


def test_clip_boxes():
    boxes = jnp.asarray([[-5.0, -5.0, 200.0, 50.0]])
    out = np.asarray(clip_boxes(boxes, (100, 150)))
    np.testing.assert_allclose(out, [[0, 0, 149, 50]])


# ------------------------------------------------------------------ NMS


def test_static_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.05], jnp.float32)
    b, s, keep = static_nms(boxes, scores, iou_threshold=0.5, score_threshold=0.1, top_k=4)
    kept_scores = np.asarray(s)[np.asarray(keep)]
    # box1 suppressed by box0 (IoU>0.5); box3 below score threshold
    np.testing.assert_allclose(sorted(kept_scores, reverse=True), [0.9, 0.7], rtol=1e-6)


def test_static_nms_fixed_output_shape():
    boxes = jnp.zeros((20, 4))
    scores = jnp.zeros((20,))
    b, s, keep = static_nms(boxes, scores, top_k=8)
    assert b.shape == (8, 4) and s.shape == (8,) and keep.shape == (8,)
    assert not np.any(np.asarray(keep))  # all below threshold


def test_batched_class_nms_classes_dont_suppress_each_other():
    boxes = jnp.asarray([[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5]], jnp.float32)
    class_scores = jnp.asarray([[0.9, 0.0], [0.0, 0.8]], jnp.float32)
    b, s, c, v = batched_class_nms(boxes, class_scores, top_k_per_class=2)
    kept = np.asarray(v)
    np.testing.assert_allclose(np.asarray(s)[kept], [0.9, 0.8], rtol=1e-6)
    assert sorted(np.asarray(c)[kept].tolist()) == [0, 1]


# ------------------------------------------------------------------ focal loss


def _toy_setup():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [20, 20, 30, 30], [100, 100, 120, 120]], jnp.float32
    )
    gt = jnp.asarray([[[0, 0, 10, 10, 0], [-1, -1, -1, -1, -1]]], jnp.float32)
    return anchors, gt


def test_focal_loss_perfect_predictions_near_zero():
    anchors, gt = _toy_setup()
    cls = jnp.asarray([[[0.999, 1e-4], [1e-4, 1e-4], [1e-4, 1e-4]]], jnp.float32)
    reg = encode_boxes(anchors, jnp.broadcast_to(gt[0, 0:1, :4], (3, 4)))[None]
    out = focal_loss(cls, reg, anchors, gt)
    assert float(out["classification"]) < 1e-2
    assert float(out["regression"]) < 1e-6


def test_focal_loss_wrong_predictions_large():
    anchors, gt = _toy_setup()
    cls_bad = jnp.asarray([[[1e-4, 0.999], [0.999, 1e-4], [0.999, 1e-4]]], jnp.float32)
    reg = jnp.zeros((1, 3, 4))
    out_bad = focal_loss(cls_bad, reg, anchors, gt)
    assert float(out_bad["classification"]) > 1.0


def test_focal_loss_no_annotations_image():
    anchors, _ = _toy_setup()
    gt_empty = -jnp.ones((1, 2, 5), jnp.float32)
    cls = jnp.full((1, 3, 2), 1e-4)
    out = focal_loss(cls, jnp.zeros((1, 3, 4)), anchors, gt_empty)
    assert float(out["classification"]) < 1e-2
    assert float(out["regression"]) == 0.0


def test_focal_loss_ignore_band():
    """Anchors with 0.4 <= IoU < 0.5 contribute no classification loss."""
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 22.3]], jnp.float32)  # IoU ~0.448
    gt = jnp.asarray([[[0, 0, 10, 10, 0]]], jnp.float32)
    iou = float(box_iou(anchors[1:2], gt[0, :, :4])[0, 0])
    assert 0.4 < iou < 0.5
    # anchor0 positive and predicted perfectly; anchor1 ignored even though its score is bad
    cls = jnp.asarray([[[0.999], [0.999]]], jnp.float32)
    reg = encode_boxes(anchors, jnp.broadcast_to(gt[0, 0:1, :4], (2, 4)))[None]
    out = focal_loss(cls, reg, anchors, gt)
    assert float(out["classification"]) < 1e-2


# ------------------------------------------------------------------ RetinaNet model


def test_retinanet_shapes_and_detect():
    cfg = {"name": "efficientnet-b0", "in_channels": 1}
    model = RetinaNet(image_encoder_config=cfg, num_classes=3)
    H, W = 64, 64
    x = jnp.zeros((1, H, W, 1))
    variables = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    out = model.apply(variables, x, train=False)
    anchors = anchors_for((H, W))
    assert out["class_probs"].shape == (1, anchors.shape[0], 3)
    assert out["box_deltas"].shape == (1, anchors.shape[0], 4)
    assert np.all(np.asarray(out["class_probs"]) <= 1.0)
    # prior bias: initial probs near 0.01
    assert 0.001 < float(np.mean(np.asarray(out["class_probs"]))) < 0.05

    det = detect(out, jnp.asarray(anchors), (H, W), top_k_per_class=10)
    assert det["boxes"].shape == (1, 30, 4)
    assert det["valid"].dtype == bool


# ------------------------------------------------------------------ mAP


def test_voc_ap_perfect():
    assert _voc_ap(np.asarray([1.0]), np.asarray([1.0])) == 1.0


def test_evaluate_map_perfect_and_missed():
    ann = [np.asarray([[0, 0, 10, 10, 0], [20, 20, 40, 40, 1]], np.float32)]
    det_perfect = [
        {
            "boxes": np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
            "scores": np.asarray([0.9, 0.8]),
            "classes": np.asarray([0, 1]),
            "valid": np.asarray([True, True]),
        }
    ]
    res = evaluate_map(det_perfect, ann, num_classes=2, class_names=["Mass", "Calc"])
    assert res["mAP"] == 1.0

    det_missed = [
        {
            "boxes": np.asarray([[100, 100, 110, 110]], np.float32),
            "scores": np.asarray([0.9]),
            "classes": np.asarray([0]),
            "valid": np.asarray([True]),
        }
    ]
    res2 = evaluate_map(det_missed, ann, num_classes=2, class_names=["Mass", "Calc"])
    assert res2["mAP"] == 0.0


def test_evaluate_map_excludes_no_finding():
    ann = [np.asarray([[0, 0, 10, 10, 0], [20, 20, 30, 30, 1]], np.float32)]
    det = [
        {
            "boxes": np.asarray([[0, 0, 10, 10]], np.float32),
            "scores": np.asarray([0.9]),
            "classes": np.asarray([0]),
            "valid": np.asarray([True]),
        }
    ]
    res = evaluate_map(det, ann, num_classes=2, class_names=["Mass", "No Finding"])
    # class 1 ('No Finding') has GT but is excluded from the mean
    assert res["mAP"] == res["AP/Mass"] == 1.0


def test_soft_nms_decays_overlaps():
    import jax.numpy as jnp
    import numpy as np

    from mammo_clip_tpu.ops.nms import soft_nms, static_nms

    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # heavy overlap with box 0
        [50, 50, 60, 60],  # disjoint
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)

    b, s, v = soft_nms(boxes, scores, sigma=0.5, top_k=3)
    s = np.asarray(s)
    # best box keeps its score; the overlapping one is decayed but alive;
    # the disjoint one is untouched
    assert abs(s[0] - 0.9) < 1e-6
    overlap_score = s[np.argmax(np.asarray(b)[:, 0] == 1)]
    assert 0.0 < overlap_score < 0.8 - 1e-4
    assert np.isclose(sorted(s)[1] if overlap_score == sorted(s)[0] else max(
        x for x in s if abs(x - 0.9) > 1e-6 and x != overlap_score), 0.7, atol=1e-6)

    # hard NMS kills the overlap entirely — soft keeps it
    _, s_hard, v_hard = static_nms(boxes, scores, iou_threshold=0.5, top_k=3)
    assert int(np.asarray(v_hard).sum()) == 2
    assert int(np.asarray(v).sum()) == 3


def test_soft_nms_linear_matches_reference_formula():
    import jax.numpy as jnp
    import numpy as np

    from mammo_clip_tpu.ops.boxes import box_iou
    from mammo_clip_tpu.ops.nms import soft_nms

    rng = np.random.default_rng(0)
    centers = rng.uniform(10, 90, (8, 2))
    wh = rng.uniform(5, 15, (8, 2))
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2], 1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0.2, 1.0, 8), jnp.float32)

    b, s, v = soft_nms(boxes, scores, top_k=8, method="linear", iou_threshold=0.3)
    # python reference of the classic greedy soft-NMS
    B = np.asarray(boxes); S = np.asarray(scores).copy()
    got = []
    alive = list(range(8))
    while alive:
        j = max(alive, key=lambda i: S[i])
        got.append((tuple(B[j]), S[j]))
        alive.remove(j)
        for i in alive:
            iou = float(np.asarray(box_iou(jnp.asarray(B[None, j]), jnp.asarray(B[None, i])))[0, 0])
            if iou > 0.3:
                S[i] *= 1.0 - iou
    ref_scores = np.array([x[1] for x in got])
    np.testing.assert_allclose(np.asarray(s), np.where(ref_scores > 0.05, ref_scores, 0.0), rtol=1e-5)


def test_multiscale_detect_merges_and_suppresses():
    """detect_multiscale: candidates from every scale land in ONE NMS pool in
    the base frame — a fake model that 'finds' the same object at both scales
    yields a single surviving box at the base-frame location."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.retinanet import detect_multiscale
    from mammo_clip_tpu.ops.boxes import build_anchors, encode_boxes

    base = (64, 64)
    target = np.array([10.0, 18.0, 40.0, 52.0])  # base-frame xyxy

    def apply_fn(imgs):
        h, w = imgs.shape[1], imgs.shape[2]
        anchors = build_anchors((h, w))
        sy, sx = h / base[0], w / base[1]
        scaled = target * np.array([sx, sy, sx, sy])
        deltas = encode_boxes(jnp.asarray(anchors), jnp.asarray(scaled)[None, :])
        # every anchor regresses to the object; score peaks on one anchor
        d = jnp.broadcast_to(deltas, (anchors.shape[0], 4))
        probs = jnp.full((anchors.shape[0], 2), 0.3, jnp.float32)
        probs = probs.at[0, 1].set(0.9)
        return {
            "class_probs": jnp.broadcast_to(probs, (imgs.shape[0],) + probs.shape),
            "box_deltas": jnp.broadcast_to(d, (imgs.shape[0],) + d.shape),
        }

    imgs = jnp.zeros((1, base[0], base[1], 1), jnp.float32)
    out = detect_multiscale(apply_fn, imgs, scales=(0.5, 1.0),
                            score_threshold=0.5, iou_threshold=0.5,
                            top_k_per_class=4)
    valid = np.asarray(out["valid"][0])
    boxes = np.asarray(out["boxes"][0])
    scores = np.asarray(out["scores"][0])
    kept = boxes[valid & (scores >= 0.5)]
    # both scales proposed the same object; the merged NMS keeps exactly the
    # two score-peak anchors (one per scale) collapsed to... the same box:
    # every kept box must be the base-frame target
    assert kept.shape[0] >= 1
    np.testing.assert_allclose(kept, np.broadcast_to(target, kept.shape),
                               atol=1.5)


def test_multiscale_single_scale_matches_detect():
    """scales=(1.0,) reduces to the plain detect() path."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.retinanet import detect, detect_multiscale
    from mammo_clip_tpu.ops.boxes import build_anchors

    rng = np.random.default_rng(0)
    base = (64, 64)
    anchors = build_anchors(base)
    A = anchors.shape[0]
    out = {
        "class_probs": jnp.asarray(rng.uniform(0, 1, (2, A, 3)), jnp.float32),
        "box_deltas": jnp.asarray(rng.normal(0, 0.1, (2, A, 4)), jnp.float32),
    }

    def apply_fn(imgs):
        return out

    d1 = detect(out, jnp.asarray(anchors), base, score_threshold=0.3)
    d2 = detect_multiscale(apply_fn, jnp.zeros((2, 64, 64, 1)), scales=(1.0,),
                           score_threshold=0.3)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(d1[k]), np.asarray(d2[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_multiscale_soft_nms_matches_single_scale_soft():
    """--soft-nms composes with --eval-scales: detect_multiscale(nms='soft') at
    scales=(1.0,) reduces to the plain detect(nms='soft') path (ADVICE r2: the
    flag used to be silently ignored under multi-scale eval)."""
    import jax.numpy as jnp

    from mammo_clip_tpu.models.retinanet import detect, detect_multiscale
    from mammo_clip_tpu.ops.boxes import build_anchors

    rng = np.random.default_rng(0)
    base = (64, 64)
    anchors = build_anchors(base)
    A = anchors.shape[0]
    out = {
        "class_probs": jnp.asarray(rng.uniform(0, 1, (2, A, 3)), jnp.float32),
        "box_deltas": jnp.asarray(rng.normal(0, 0.1, (2, A, 4)), jnp.float32),
    }

    d1 = detect(out, jnp.asarray(anchors), base, score_threshold=0.3, nms="soft")
    d2 = detect_multiscale(lambda imgs: out, jnp.zeros((2, 64, 64, 1)),
                           scales=(1.0,), score_threshold=0.3, nms="soft")
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(np.asarray(d1[k]), np.asarray(d2[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    # and the soft pool differs from the hard pool (the flag has an effect)
    dh = detect_multiscale(lambda imgs: out, jnp.zeros((2, 64, 64, 1)),
                           scales=(1.0,), score_threshold=0.3, nms="hard")
    assert not np.allclose(np.asarray(dh["scores"]), np.asarray(d2["scores"]))
