"""Classification losses.

``bce_with_logits_loss`` matches the reference's ``Classification`` loss
(reference: breastclip/loss/classification.py:4-16): BCE-with-logits after clamping
negative (missing) labels to 0 — done functionally here instead of the reference's
in-place label mutation. Also provides the weighted-BCE and CE paths the downstream
classifier uses (reference: Classifiers/experiments.py:103-141, pos_weight tables
train_classifier.py:113-141).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[float] = None,
    **_: object,
) -> jnp.ndarray:
    """Mean binary cross entropy with logits; negative targets clamped to 0.

    With ``pos_weight`` w: loss = -[w * y * log(sigmoid(x)) + (1-y) * log(1-sigmoid(x))],
    matching torch.nn.BCEWithLogitsLoss(pos_weight=...).
    """
    logits = logits.astype(jnp.float32)
    targets = jnp.clip(targets.astype(jnp.float32), 0.0, None)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    w_pos = 1.0 if pos_weight is None else pos_weight
    loss = -(w_pos * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(loss)


def softmax_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, **_: object) -> jnp.ndarray:
    """Multi-class CE for density (4-way) / BIRADS (3-way) heads
    (reference: Classifiers/experiments.py:103-108,140-141)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return jnp.mean(nll)
