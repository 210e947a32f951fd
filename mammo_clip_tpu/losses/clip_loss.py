"""Contrastive losses (global-batch negatives), TPU-native.

Math parity with the reference's multi-positive symmetric InfoNCE
(reference: breastclip/loss/breast_clip.py:29-127) and single-pair variant
(breast_clip_contrastive.py:29-59). The distributed design differs on purpose:

The reference all-gathers embeddings across NCCL ranks with a custom autograd Function
(fwd all_gather / bwd reduce_scatter, util/dist_autograd.py:5-27) and offsets the labels
by ``rank * batch_size`` (breast_clip.py:39-40). Under pjit/GSPMD the loss below is
written over the **global** batch: embeddings arrive as global arrays whose batch axis is
sharded over the mesh's 'data' axis, ``img @ txt.T`` forces XLA to insert the all-gather
over ICI, and autodiff produces the matching reduce-scatter. Labels are simply
``arange(global_batch)`` — rank offsets vanish. Per-rank-mean CE equals global-mean CE
when per-device batches are equal, so the objective is identical. A shard_map variant
with explicit ``lax.all_gather`` lives in parallel/shard_loss.py and is tested equal.

Sub-term weighting (reference configs/loss/breast_clip.yaml:1-5): total =
(i2t + t2i)/2 + 1.0 * i2i + 0.5 * t2t, with the 4 view/text pairs averaged /4 and label
smoothing applied to i2t/t2i only (train only), never to i2i/t2t (breast_clip.py:45-100).

Sub-terms are RETURNED in the loss dict instead of being written to TensorBoard from
inside the loss through a global singleton (the reference's hidden L2b->observability
coupling, breast_clip.py:102-120) — the trainer logs them.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean CE over the batch with torch-style label smoothing.

    Matches ``torch.nn.functional.cross_entropy(logits, labels, label_smoothing=s)``:
    target distribution = (1-s) * onehot + s / num_classes.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)


def _pair_ce(
    a: jnp.ndarray, b: jnp.ndarray, scale: jnp.ndarray, labels: jnp.ndarray, smoothing: float
) -> jnp.ndarray:
    # The (B_global x B_global) logits matmul is tiny next to the encoders, so force a
    # true-fp32 MXU path (TPU default precision would do bf16 passes on fp32 inputs).
    logits = scale * jnp.matmul(
        a.astype(jnp.float32),
        b.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    return cross_entropy(logits, labels, smoothing)


def multi_positive_clip_loss(
    image_embeddings: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    logit_scale: jnp.ndarray,
    text_embeddings2: Optional[jnp.ndarray] = None,
    image_view_embeddings: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
    i2i_weight: float = 1.0,
    t2t_weight: float = 0.5,
    is_train: bool = True,
    **_: object,
) -> Dict[str, jnp.ndarray]:
    """Multi-positive symmetric InfoNCE over the global batch.

    With only (I1, T1) present this degrades to the symmetric 2-term CLIP loss
    (i2i/t2t terms skipped), mirroring how the reference feeds the same batch through
    4 pairs only when second views/texts exist (clip.py:103-112).
    """
    n = image_embeddings.shape[0]
    labels = jnp.arange(n, dtype=jnp.int32)
    s = label_smoothing if is_train else 0.0
    scale = logit_scale.astype(jnp.float32)

    i1, t1 = image_embeddings, text_embeddings
    if text_embeddings2 is None or image_view_embeddings is None:
        loss_i2t = _pair_ce(i1, t1, scale, labels, s)
        loss_t2i = _pair_ce(t1, i1, scale, labels, s)
        total = (loss_i2t + loss_t2i) / 2.0
        return {
            "contrastive": total,
            "i2t": loss_i2t,
            "t2i": loss_t2i,
        }

    i2, t2 = image_view_embeddings, text_embeddings2
    # 4 symmetric image-text pairs, averaged (breast_clip.py:45-78).
    loss_i2t = (
        _pair_ce(i1, t1, scale, labels, s)
        + _pair_ce(i2, t1, scale, labels, s)
        + _pair_ce(i1, t2, scale, labels, s)
        + _pair_ce(i2, t2, scale, labels, s)
    ) / 4.0
    loss_t2i = (
        _pair_ce(t1, i1, scale, labels, s)
        + _pair_ce(t1, i2, scale, labels, s)
        + _pair_ce(t2, i1, scale, labels, s)
        + _pair_ce(t2, i2, scale, labels, s)
    ) / 4.0
    # ICL / TCL (no label smoothing, breast_clip.py:81-100).
    loss_i2i = (_pair_ce(i1, i2, scale, labels, 0.0) + _pair_ce(i2, i1, scale, labels, 0.0)) / 2.0
    loss_t2t = (_pair_ce(t2, t1, scale, labels, 0.0) + _pair_ce(t1, t2, scale, labels, 0.0)) / 2.0

    total = (loss_i2t + loss_t2i) / 2.0 + i2i_weight * loss_i2i + t2t_weight * loss_t2t
    return {
        "contrastive": total,
        "i2t": loss_i2t,
        "t2i": loss_t2i,
        "i2i": loss_i2i,
        "t2t": loss_t2t,
    }


def contrastive_clip_loss(
    image_embeddings: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    logit_scale: jnp.ndarray,
    label_smoothing: float = 0.0,
    i2t_weight: float = 0.75,
    t2i_weight: float = 0.25,
    is_train: bool = True,
    **_: object,
) -> Dict[str, jnp.ndarray]:
    """ConVIRT-style asymmetric single-pair loss: 0.75*i2t + 0.25*t2i
    (reference: breast_clip_contrastive.py:58)."""
    n = image_embeddings.shape[0]
    labels = jnp.arange(n, dtype=jnp.int32)
    s = label_smoothing if is_train else 0.0
    scale = logit_scale.astype(jnp.float32)
    loss_i2t = _pair_ce(image_embeddings, text_embeddings, scale, labels, s)
    loss_t2i = _pair_ce(text_embeddings, image_embeddings, scale, labels, s)
    total = i2t_weight * loss_i2t + t2i_weight * loss_t2i
    return {"contrastive": total, "i2t": loss_i2t, "t2i": loss_t2i}
