"""Mammo-FActOR: region-to-sentence interpretability mapper.

Library-grade port of the reference's notebook-only implementation
(reference: notebooks/Mammo-Factor/Mammo-Factor.ipynb cells 1-3; SURVEY.md §2 flags
promoting it out of the notebook):

* attribute embeddings = L2-normalized mean of the attribute's prompt/sentence text
  embeddings from the frozen CLIP text tower (cell 1);
* ``FactorMapper``: the frozen CLIP image encoder's raw feature map (B, H, W, C) is
  read as C per-channel "regions", each a flattened (H*W,) spatial signature; one
  2-layer MLP per attribute projects signatures into the language space (cell 2;
  the reference flattens NCHW to (B, C, H*W) and applies Linear over H*W);
* ``factor_loss``: region-attribute max-similarity contrastive loss at temperature
  0.07 (cell 3): per attribute, image-level similarity = max over regions; the
  denominator contrasts against the batch's negative images.

The encoder itself stays outside this module (frozen, supplied features), so the
mapper trains with forward-only encoder cost.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FactorMapper(nn.Module):
    """Per-attribute region projection heads over frozen CLIP feature maps."""

    num_attributes: int
    lang_dim: int = 512
    spatial_dim: int = 0  # H*W of the raw feature map (static)
    one_proj: bool = False
    adapter: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, raw_features: jnp.ndarray) -> jnp.ndarray:
        """raw_features (B, H, W, C) -> region embeddings (B, C, A, lang_dim)."""
        B, H, W, C = raw_features.shape
        assert H * W == self.spatial_dim, (H * W, self.spatial_dim)
        flat = raw_features.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, C, HW)
        n_proj = 1 if self.one_proj else self.num_attributes
        outs = []
        for i in range(n_proj):
            h = nn.Dense(self.spatial_dim, dtype=self.dtype, name=f"proj{i}_fc1")(flat)
            h = jax.nn.relu(h)
            h = nn.Dense(self.lang_dim, dtype=self.dtype, name=f"proj{i}_fc2")(h)
            if self.adapter:
                h = 0.2 * h + 0.8 * flat[..., : self.lang_dim]
            outs.append(h)
        out = jnp.stack(outs, axis=2)  # (B, C, n_proj, L)
        if self.one_proj:
            out = jnp.broadcast_to(out, (B, C, self.num_attributes, self.lang_dim))
        return out


def factor_loss(
    region_embs: jnp.ndarray,  # (B, C, A, L) from FactorMapper
    attr_embs: jnp.ndarray,  # (A, L) L2-normalized attribute embeddings
    labels: jnp.ndarray,  # (B, A) binary attribute presence
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Region-attribute max-similarity contrastive loss (notebook cell 3).

    All attributes are computed; absent attributes are masked out of the mean rather
    than index-sliced (shape-static for TPU; equivalent to the reference's attr_ids
    selection because masked terms contribute 0 to numerator and count).
    """
    regions = region_embs.astype(jnp.float32)
    # safe normalize: jnp.linalg.norm's gradient is NaN at an exactly-zero row,
    # and the mapper CAN emit zero rows at init (zero biases + relu on tiny
    # frozen features) — sqrt(sum^2 + eps) keeps the backward finite there.
    norm2 = jnp.sum(regions * regions, axis=-1, keepdims=True)
    regions = regions * jax.lax.rsqrt(norm2 + 1e-12)
    sim_regions = jnp.einsum("bcal,al->bca", regions, attr_embs.astype(jnp.float32))
    sim = jnp.max(sim_regions, axis=1) / temperature  # (B, A) image-attribute sims

    labels = labels.astype(jnp.float32)
    attr_present = (jnp.sum(labels, axis=0) > 0).astype(jnp.float32)  # (A,)
    inv = 1.0 - labels
    # denom[b, a] = exp(sim[b,a]) + sum_b' exp(sim[b',a] * inv[b',a])
    denom = jnp.exp(sim) + jnp.sum(jnp.exp(sim * inv), axis=0, keepdims=True)
    log_prob = sim - jnp.log(denom)
    mask = labels * attr_present[None, :]
    n_terms = jnp.clip(jnp.sum(mask), 1.0, None)
    return -jnp.sum(log_prob * mask) / n_terms


def attribute_embeddings(
    extractor,
    tokenizer,
    attribute_prompts: Dict[str, Sequence[str]],
    max_length: int = 256,
) -> Dict[str, np.ndarray]:
    """attribute -> L2-normalized mean prompt embedding (notebook cell 1)."""
    out: Dict[str, np.ndarray] = {}
    for attr, prompts in attribute_prompts.items():
        enc = tokenizer(list(prompts), max_length=max_length)
        emb = extractor.encode_texts(enc["input_ids"], enc["attention_mask"])
        mean = emb.mean(axis=0)
        out[attr] = mean / np.linalg.norm(mean)
    return out
