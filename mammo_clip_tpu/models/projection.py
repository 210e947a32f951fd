"""Projection heads (reference: breastclip/model/modules/projection.py:4-29).

``linear``: single Dense to proj_dim (the shipped config: proj_dim=512,
configs/model/clip_b5_det_clinical.yaml:20-23).
``mlp``: Dense -> GELU -> Dense -> Dropout -> residual -> LayerNorm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class LinearProjectionHead(nn.Module):
    proj_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return nn.Dense(self.proj_dim, dtype=self.dtype, name="projection")(x)


class MLPProjectionHead(nn.Module):
    proj_dim: int = 512
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        proj = nn.Dense(self.proj_dim, dtype=self.dtype, name="projection")(x)
        h = jax.nn.gelu(proj, approximate=False)
        h = nn.Dense(self.proj_dim, dtype=self.dtype, name="fc")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h + proj
        return nn.LayerNorm(dtype=self.dtype, name="ln")(h)


def make_projection_head(config: dict, dtype: Any = jnp.float32) -> nn.Module:
    name = config.get("name", "linear")
    if name == "linear":
        return LinearProjectionHead(proj_dim=config.get("proj_dim", 512), dtype=dtype)
    if name == "mlp":
        return MLPProjectionHead(
            proj_dim=config.get("proj_dim", 512),
            dropout=config.get("dropout", 0.1),
            dtype=dtype,
        )
    raise ValueError(f"unknown projection head: {name}")
