"""Pooling primitives.

GeM (generalized-mean) pooling matches the reference's timm-backed classifier path
(reference: breastclip/model/modules/image_encoder.py:51-66, p=3, eps=1e-6). On TPU the
clamp+pow+mean+pow chain is a single VPU fusion; no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NC global average pool (EfficientNet head pooling)."""
    return jnp.mean(x, axis=(1, 2))


def gem_pool(x: jnp.ndarray, p: float = 3.0, eps: float = 1e-6) -> jnp.ndarray:
    """Generalized-mean pool over spatial dims of an NHWC tensor -> (N, C).

    gem(x) = (mean(clamp(x, eps)^p))^(1/p). Computed in fp32 for stability under bf16
    activations (pow of small numbers underflows bf16).
    """
    dt = x.dtype
    x32 = jnp.clip(x.astype(jnp.float32), eps, None)
    pooled = jnp.mean(x32**p, axis=(1, 2)) ** (1.0 / p)
    return pooled.astype(dt)
