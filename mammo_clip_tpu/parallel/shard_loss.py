"""Explicit-collective (shard_map) variant of the contrastive loss.

The primary loss (losses/clip_loss.py) is written over global arrays and lets GSPMD
insert the collectives. This module is the manual-SPMD equivalent — each device holds a
per-device batch shard, explicitly ``lax.all_gather``s the other devices' embeddings
over the 'data' axis, and offsets its labels by ``axis_index * local_batch`` — i.e. the
same communication pattern the reference hand-rolls over NCCL
(reference: util/dist_autograd.py:5-27 fwd all_gather / bwd reduce_scatter;
rank-offset labels breast_clip.py:39-40). JAX autodiff derives the reduce-scatter
backward of ``all_gather`` automatically.

Use this inside ``jax.shard_map`` when composing with other manually-sharded code;
tests assert it matches the GSPMD loss bit-for-bit-ish on an 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..losses.clip_loss import cross_entropy


def _gather(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def shard_map_clip_loss(
    image_embeddings: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    logit_scale: jnp.ndarray,
    axis_name: str = "data",
    text_embeddings2: Optional[jnp.ndarray] = None,
    image_view_embeddings: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
    i2i_weight: float = 1.0,
    t2t_weight: float = 0.5,
    is_train: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Per-device multi-positive InfoNCE with explicit all-gathered negatives.

    Args hold the LOCAL batch shard. Returns the same loss dict as
    losses.multi_positive_clip_loss; values are psum-averaged across the axis so every
    device sees the global loss.
    """
    local_b = image_embeddings.shape[0]
    rank = jax.lax.axis_index(axis_name)
    labels = jnp.arange(local_b, dtype=jnp.int32) + rank * local_b
    s = label_smoothing if is_train else 0.0
    scale = logit_scale.astype(jnp.float32)

    def pair(a_local, b_gathered, smoothing):
        logits = scale * jnp.matmul(
            a_local.astype(jnp.float32),
            b_gathered.astype(jnp.float32).T,
            precision=jax.lax.Precision.HIGHEST,
        )
        return cross_entropy(logits, labels, smoothing)

    i1, t1 = image_embeddings, text_embeddings
    gi1, gt1 = _gather(i1, axis_name), _gather(t1, axis_name)

    if text_embeddings2 is None or image_view_embeddings is None:
        loss_i2t = pair(i1, gt1, s)
        loss_t2i = pair(t1, gi1, s)
        out = {
            "contrastive": (loss_i2t + loss_t2i) / 2.0,
            "i2t": loss_i2t,
            "t2i": loss_t2i,
        }
    else:
        i2, t2 = image_view_embeddings, text_embeddings2
        gi2, gt2 = _gather(i2, axis_name), _gather(t2, axis_name)
        loss_i2t = (pair(i1, gt1, s) + pair(i2, gt1, s) + pair(i1, gt2, s) + pair(i2, gt2, s)) / 4.0
        loss_t2i = (pair(t1, gi1, s) + pair(t1, gi2, s) + pair(t2, gi1, s) + pair(t2, gi2, s)) / 4.0
        loss_i2i = (pair(i1, gi2, 0.0) + pair(i2, gi1, 0.0)) / 2.0
        loss_t2t = (pair(t2, gt1, 0.0) + pair(t1, gt2, 0.0)) / 2.0
        out = {
            "contrastive": (loss_i2t + loss_t2i) / 2.0 + i2i_weight * loss_i2i + t2t_weight * loss_t2t,
            "i2t": loss_i2t,
            "t2i": loss_t2i,
            "i2i": loss_i2i,
            "t2t": loss_t2t,
        }
    # Per-rank CE means -> global mean (equal shards), matching DDP's grad averaging.
    return {k: jax.lax.pmean(v, axis_name) for k, v in out.items()}
