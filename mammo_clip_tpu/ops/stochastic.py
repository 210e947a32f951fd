"""Stochastic-depth (drop-connect) for residual blocks.

Behavioral parity with the reference's ``drop_connect``
(reference: breastclip/model/modules/efficient_net_custom_utils.py, used by MBConvBlock):
per-SAMPLE Bernoulli keep mask applied to the residual branch, scaled by 1/keep_prob.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_connect(x: jnp.ndarray, rng: jax.Array, rate: float, deterministic: bool) -> jnp.ndarray:
    """Drop the entire residual branch per sample with probability ``rate``."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
