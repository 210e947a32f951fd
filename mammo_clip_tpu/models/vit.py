"""Vision Transformer image encoder (Flax, NHWC) with interpolated position
embeddings.

Capability parity with the reference's HuggingfaceImageEncoder ViT/Swin option
(reference: breastclip/model/modules/image_encoder.py:17-48 — ViT called with
``interpolate_pos_encoding=True`` so non-224 mammography resolutions work). The CLIP
module takes the CLS token as the global representation (reference clip.py:46-54).

TPU-first: patch embedding as a strided conv (MXU), static token count per input
shape, bilinear pos-embedding interpolation at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    base_grid: int = 14  # pretraining grid (224/16); pos embeddings interpolate from it
    dropout_rate: float = 0.0
    ln_eps: float = 1e-12  # HF ViTConfig.layer_norm_eps (weight-import parity)

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(patch_size=8, hidden_size=32, num_layers=2, num_heads=2, mlp_dim=64, base_grid=4)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=self.dtype, name="attn",
            dropout_rate=cfg.dropout_rate, deterministic=deterministic,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViT(nn.Module):
    cfg: ViTConfig = ViTConfig()
    in_channels: int = 1
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.cfg.hidden_size

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, H, W, _ = x.shape
        p = cfg.patch_size
        assert H % p == 0 and W % p == 0, f"input {H}x{W} not divisible by patch {p}"
        x = x.astype(self.dtype)
        patches = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), name="patch_embed",
                          dtype=self.dtype)(x)  # (B, H/p, W/p, D)
        gh, gw = patches.shape[1], patches.shape[2]
        tokens = patches.reshape(B, gh * gw, cfg.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, cfg.base_grid * cfg.base_grid + 1, cfg.hidden_size),
        )
        # interpolate grid pos embeddings to (gh, gw) — the reference's
        # interpolate_pos_encoding=True behavior
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        grid_pos = grid_pos.reshape(1, cfg.base_grid, cfg.base_grid, cfg.hidden_size)
        grid_pos = jax.image.resize(grid_pos, (1, gh, gw, cfg.hidden_size), "bilinear")
        grid_pos = grid_pos.reshape(1, gh * gw, cfg.hidden_size)

        tokens = tokens + grid_pos.astype(self.dtype)
        cls_tok = jnp.broadcast_to(cls + cls_pos, (B, 1, cfg.hidden_size)).astype(self.dtype)
        seq = jnp.concatenate([cls_tok, tokens], axis=1)
        for i in range(cfg.num_layers):
            seq = ViTBlock(cfg, dtype=self.dtype, name=f"block_{i}")(seq, deterministic=not train)
        seq = nn.LayerNorm(epsilon=self.cfg.ln_eps, dtype=self.dtype, name="ln_final")(seq)
        return {
            "pooled": seq[:, 0],  # CLS token (reference clip.py:50-54)
            "features": seq[:, 1:].reshape(B, gh, gw, cfg.hidden_size),
            "tokens": seq,
        }
