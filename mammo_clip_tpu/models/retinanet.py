"""RetinaNet detection head over the CLIP EfficientNet backbone (Flax, NHWC).

Capability parity with the reference detector
(reference: Detectors/retinanet/detector_model.py):
* FPN P3..P7 at 256 channels built from backbone taps C3 (stride 16 in the reference's
  tap scheme), C4 and C5 (stride 32). The reference upsamples C3/C4 by 2 inside the FPN
  (detector_model.py:81-112), so the final pyramid sits at strides 8/16/32/64/128 —
  matching the anchor lattice; we reproduce exactly that topology.
* shared 4-conv regression and classification subnets, 9 anchors/location
  (detector_model.py:115-239); classification output sigmoid with prior-bias init
  -log((1-0.01)/0.01) (detector_model.py:288-292).
* backbone taps: b5 blocks [26,37]+head (FPN inputs [176,512,2048]), b2 [15,21]+head
  ([120,352,1408]) (detector_model.py:374-391) via EfficientNet.feature_taps.
* anchors precomputed ONCE per static image size (ops/boxes.py) — not per forward.
* BatchNorm in the backbone stays in inference mode during detector training,
  matching the reference's frozen-BN (detector_model.py:297-305).

Inference is shape-static: decode -> clip -> per-class static NMS (ops/nms.py) instead
of the reference's data-dependent torchvision path (detector_model.py:331-354).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import build_anchors, clip_boxes, decode_boxes
from ..ops.nms import batched_class_nms
from .clip import efficientnet_variant
from .efficientnet import default_detector_taps


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 (torch nn.Upsample(scale_factor=2, mode='nearest'))."""
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FPN(nn.Module):
    """P3..P7 pyramid from (C3, C4, C5); reproduces the reference topology incl. the
    x2 upsampling of the C3/C4 taps (detector_model.py:81-112)."""

    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3: jnp.ndarray, c4: jnp.ndarray, c5: jnp.ndarray):
        conv1 = lambda n: nn.Conv(self.feature_size, (1, 1), dtype=self.dtype, name=n)
        conv3 = lambda n, s=1: nn.Conv(
            self.feature_size, (3, 3), strides=(s, s), padding="SAME", dtype=self.dtype, name=n
        )
        p5 = conv1("p5_lateral")(c5)                      # stride 32
        p5_up = _upsample2(p5)                            # stride 16
        p5_out = conv3("p5_out")(p5)

        p4 = _upsample2(conv1("p4_lateral")(c4))          # 32 -> 16
        p4 = p4 + p5_up
        p4_up = _upsample2(p4)                            # stride 8
        p4_out = conv3("p4_out")(p4)

        p3 = _upsample2(conv1("p3_lateral")(c3))          # 16 -> 8
        p3 = p3 + p4_up
        p3_out = conv3("p3_out")(p3)

        p6 = conv3("p6", s=2)(c5)                         # stride 64
        p7 = conv3("p7", s=2)(jax.nn.relu(p6))            # stride 128
        return [p3_out, p4_out, p5_out, p6, p7]


class BoxSubnet(nn.Module):
    """Shared regression subnet: 4x (conv3x3 256 + relu) -> 4*num_anchors."""

    num_anchors: int = 9
    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(4):
            x = jax.nn.relu(
                nn.Conv(self.feature_size, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            )
        x = nn.Conv(self.num_anchors * 4, (3, 3), padding="SAME", dtype=self.dtype, name="out")(x)
        B, H, W, _ = x.shape
        return x.reshape(B, H * W * self.num_anchors, 4)


class ClassSubnet(nn.Module):
    """Shared classification subnet with focal prior bias; emits sigmoid probs."""

    num_classes: int
    num_anchors: int = 9
    feature_size: int = 256
    prior: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(4):
            x = jax.nn.relu(
                nn.Conv(self.feature_size, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            )
        bias_init = nn.initializers.constant(-np.log((1.0 - self.prior) / self.prior))
        x = nn.Conv(
            self.num_anchors * self.num_classes,
            (3, 3),
            padding="SAME",
            bias_init=bias_init,
            dtype=self.dtype,
            name="out",
        )(x)
        B, H, W, _ = x.shape
        x = x.reshape(B, H * W * self.num_anchors, self.num_classes)
        return jax.nn.sigmoid(x.astype(jnp.float32))


class RetinaNet(nn.Module):
    """Backbone + FPN + shared subnets. ``__call__`` returns per-anchor classification
    probabilities and regression deltas; use losses.focal_loss for training and
    ``detect()`` for shape-static inference."""

    image_encoder_config: Dict
    num_classes: int
    freeze_backbone: bool = False
    feature_size: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        # shared encoder factory (r3): the checkpoint-embedded config's flags
        # (tpu_optimized recipe incl. dense widths, s2d_exec, ...) all apply,
        # so flagship checkpoints back the detector too. The b5/b2 taps live
        # in deep blocks that survive the flagship's front-end replacement.
        from .clip import load_image_encoder

        ie = dict(self.image_encoder_config)
        variant = efficientnet_variant(ie["name"])
        ie["feature_taps"] = default_detector_taps(variant)
        self.backbone = load_image_encoder(ie, dtype=self.dtype)
        self.fpn = FPN(self.feature_size, dtype=self.dtype)
        self.box_subnet = BoxSubnet(dtype=self.dtype)
        self.class_subnet = ClassSubnet(num_classes=self.num_classes, dtype=self.dtype)

    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        # Backbone BN frozen (running stats) even in training — reference freezes all
        # detector BN (detector_model.py:297-305); the heads are BN-free.
        feats = self.backbone(images, train=False)
        c3, c4 = feats["taps"]
        c5 = feats["features"]
        if self.freeze_backbone:
            c3, c4, c5 = map(jax.lax.stop_gradient, (c3, c4, c5))
        levels = self.fpn(c3, c4, c5)
        reg = jnp.concatenate([self.box_subnet(p) for p in levels], axis=1)
        cls = jnp.concatenate([self.class_subnet(p) for p in levels], axis=1)
        return {"class_probs": cls, "box_deltas": reg}


def _per_class_nms(boxes, cls_probs, nms, iou_threshold, score_threshold,
                   top_k_per_class, soft_nms_sigma):
    """Single-image per-class NMS over a candidate pool; ``nms`` picks hard
    suppression or gaussian soft-NMS. Shared by detect / detect_multiscale so
    the soft mode composes with every eval path."""
    if nms == "soft":
        from ..ops.nms import soft_nms

        def per_class(c_scores):
            return soft_nms(boxes, c_scores, sigma=soft_nms_sigma,
                            iou_threshold=iou_threshold,
                            score_threshold=score_threshold,
                            top_k=top_k_per_class)

        bb, ss, vv = jax.vmap(per_class, in_axes=1)(cls_probs)  # (C, K, ...)
        C = cls_probs.shape[1]
        cc = jnp.broadcast_to(jnp.arange(C)[:, None], (C, top_k_per_class))
        return bb.reshape(-1, 4), ss.reshape(-1), cc.reshape(-1), vv.reshape(-1)
    return batched_class_nms(
        boxes, cls_probs, iou_threshold, score_threshold, top_k_per_class
    )


def anchors_for(image_shape: Tuple[int, int]) -> np.ndarray:
    """Static per-shape anchor lattice (see ops/boxes.build_anchors)."""
    return build_anchors(image_shape)


def detect(
    outputs: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,
    image_shape: Tuple[int, int],
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    top_k_per_class: int = 100,
    nms: str = "hard",
    soft_nms_sigma: float = 0.5,
):
    """Decode + clip + per-class NMS for a whole batch.

    Returns dict of (B, C*K, ...) arrays: boxes, scores, classes, valid.
    Reference eval path: detector_model.py:331-354 (score>0.05 filter, NMS@0.5).
    ``nms='soft'`` swaps in gaussian soft-NMS (Bodla 2017) — overlapping boxes are
    score-decayed instead of killed; same shape-static TPU cost.
    """

    def per_image(cls_probs, deltas):
        boxes = clip_boxes(decode_boxes(anchors, deltas), image_shape)
        return _per_class_nms(boxes, cls_probs, nms, iou_threshold,
                              score_threshold, top_k_per_class, soft_nms_sigma)

    b, s, c, v = jax.vmap(per_image)(outputs["class_probs"], outputs["box_deltas"])
    return {"boxes": b, "scores": s, "classes": c, "valid": v}


def detect_multiscale(
    apply_fn,
    images: jnp.ndarray,
    scales: Tuple[float, ...],
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    top_k_per_class: int = 100,
    nms: str = "hard",
    soft_nms_sigma: float = 0.5,
):
    """Multi-scale inference: run the detector at several image scales, map all
    candidate boxes back to the base frame, and run ONE per-class NMS over the
    merged pool (so a detection found at any scale can suppress duplicates from
    the others).

    A capability the reference's single-scale eval (detector_model.py:331-354)
    lacks; standard test-time trick for small-lesion recall. Shape-static: the
    scale set is a static tuple, each scale is its own compiled branch, and the
    merged candidate pool has a fixed size (sum of per-scale anchor counts).

    ``apply_fn(images) -> {"class_probs", "box_deltas"}`` runs the model (close
    over variables/jit outside). Returns the same dict as ``detect``.
    """
    base_h, base_w = images.shape[1], images.shape[2]
    all_boxes, all_probs = [], []
    for s in scales:
        # snap scaled dims to the FPN stride (32) so level shapes stay clean
        sh = max(32, int(round(base_h * s / 32)) * 32)
        sw = max(32, int(round(base_w * s / 32)) * 32)
        imgs = images if (sh, sw) == (base_h, base_w) else jax.image.resize(
            images, (images.shape[0], sh, sw, images.shape[3]), "bilinear")
        out = apply_fn(imgs)
        anchors = jnp.asarray(build_anchors((sh, sw)))

        def per_image(deltas):
            boxes = clip_boxes(decode_boxes(anchors, deltas), (sh, sw))
            # map back to the base frame (independent x/y rescale)
            rescale = jnp.asarray(
                [base_w / sw, base_h / sh, base_w / sw, base_h / sh],
                boxes.dtype)
            return boxes * rescale

        all_boxes.append(jax.vmap(per_image)(out["box_deltas"]))
        all_probs.append(out["class_probs"])
    boxes = jnp.concatenate(all_boxes, axis=1)   # (B, sum_A, 4)
    probs = jnp.concatenate(all_probs, axis=1)   # (B, sum_A, C)

    def merged_nms(bx, pr):
        return _per_class_nms(bx, pr, nms, iou_threshold, score_threshold,
                              top_k_per_class, soft_nms_sigma)

    b, s_, c, v = jax.vmap(merged_nms)(boxes, probs)
    return {"boxes": b, "scores": s_, "classes": c, "valid": v}
