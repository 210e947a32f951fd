"""Shape-static non-maximum suppression for TPU.

The reference calls torchvision's CUDA NMS on data-dependent shapes after a score
filter (reference: detector_model.py:331-354) — impossible under XLA's static-shape
model. This version is the standard TPU redesign (SURVEY.md §7 hard-part #3):

1. take the top-K candidates by score (static K);
2. iterate K times with a suppression mask: each round selects the highest-scoring
   unsuppressed candidate, emits it, and suppresses everything with IoU > threshold;
3. emit fixed-size (K,) keep flags; padding slots carry score 0.

Entirely ``fori_loop`` + masking — jittable, batchable with vmap, and O(K^2) IoU work
on a (K,K) matrix that fits comfortably in VMEM for K<=512.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import box_iou


@partial(jax.jit, static_argnames=("top_k",))
def static_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.05,
    top_k: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS over (A,4)/(A,) -> (top_k,4) boxes, (top_k,) scores, (top_k,) valid mask.

    Results are ordered by descending score; suppressed/padded slots have score 0 and
    valid=False.
    """
    scores = jnp.where(scores >= score_threshold, scores, 0.0)
    k = min(top_k, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]

    iou = box_iou(top_boxes, top_boxes)  # (k, k)
    alive = top_scores > 0.0

    def body(i, carry):
        alive, keep = carry
        # candidates are pre-sorted by score: slot i is the next-highest survivor
        is_kept = alive[i]
        keep = keep.at[i].set(is_kept)
        suppress = is_kept & (iou[i] > iou_threshold)
        suppress = suppress.at[i].set(False)
        alive = alive & ~suppress
        return alive, keep

    _, keep = jax.lax.fori_loop(0, k, body, (alive, jnp.zeros((k,), bool)))
    out_scores = jnp.where(keep, top_scores, 0.0)
    if k < top_k:
        pad = top_k - k
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        keep = jnp.pad(keep, (0, pad))
    return top_boxes, out_scores, keep


def batched_class_nms(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.05,
    top_k_per_class: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class NMS (classes don't suppress each other, matching the reference's
    per-class torchvision call). boxes (A,4), class_scores (A,C) ->
    (C*top_k, 4) boxes, scores, class ids, valid mask.
    """
    C = class_scores.shape[1]

    def per_class(c_scores):
        return static_nms(boxes, c_scores, iou_threshold, score_threshold, top_k_per_class)

    b, s, v = jax.vmap(per_class, in_axes=1)(class_scores)  # (C, K, ...)
    classes = jnp.broadcast_to(jnp.arange(C)[:, None], (C, top_k_per_class))
    return (
        b.reshape(-1, 4),
        s.reshape(-1),
        classes.reshape(-1),
        v.reshape(-1),
    )


@partial(jax.jit, static_argnames=("top_k", "method"))
def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    sigma: float = 0.5,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.05,
    top_k: int = 100,
    method: str = "gaussian",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al. 2017), shape-static.

    Instead of killing overlapping boxes, each selection DECAYS its neighbours'
    scores — gaussian: s *= exp(-iou^2 / sigma); linear: s *= (1 - iou) for
    iou > threshold. Same fori_loop + (K, K) IoU structure as static_nms, so the
    TPU cost is identical. Returns (top_k, 4) boxes, decayed scores, valid mask
    (score still above score_threshold after decay).
    """
    scores = jnp.where(scores >= score_threshold, scores, 0.0)
    k = min(top_k, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    iou = box_iou(top_boxes, top_boxes)  # (k, k)

    def body(i, carry):
        cur, done, order = carry
        # highest remaining (not-yet-processed) score
        masked = jnp.where(done, -jnp.inf, cur)
        j = jnp.argmax(masked)
        done = done.at[j].set(True)
        order = order.at[i].set(j)
        row = iou[j]
        if method == "gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        else:
            decay = jnp.where(row > iou_threshold, 1.0 - row, 1.0)
        decay = jnp.where(done, 1.0, decay)  # never decay already-emitted boxes
        return cur * decay, done, order

    init = (top_scores, jnp.zeros((k,), bool), jnp.zeros((k,), jnp.int32))
    final_scores, _, order = jax.lax.fori_loop(0, k, body, init)
    out_boxes = top_boxes[order]
    out_scores = final_scores[order]
    # >= : an undecayed box exactly AT the threshold passed the input filter and
    # must stay valid (static_nms keeps it; > would drop boundary detections)
    valid = out_scores >= score_threshold
    out_scores = jnp.where(valid, out_scores, 0.0)
    if k < top_k:
        pad = top_k - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return out_boxes, out_scores, valid
