"""Headless ResNet feature extractor (Flax, NHWC).

Capability parity with the reference's torchvision-based headless ResNet-101/152
option (reference: breastclip/model/modules/image_encoder.py:119-152 and the factory
entries resnet101/resnet152, modules/__init__.py:47-52). Bottleneck-v1 topology with
the standard [3,4,23,3] / [3,8,36,3] stage repeats, returning pooled (N, 2048)
features plus the raw C5 map.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_STAGES: Dict[str, Sequence[int]] = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(bn("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(bn("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample")(x)
            residual = bn("downsample_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNet(nn.Module):
    variant: str = "resnet101"
    in_channels: int = 1
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        stages = _STAGES[self.variant]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="stem_bn")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, reps in enumerate(stages):
            for i in range(reps):
                strides = 2 if (i == 0 and stage > 0) else 1
                x = Bottleneck(64 * 2**stage, strides=strides, dtype=self.dtype,
                               name=f"stage{stage + 1}_block{i}")(x, train=train)
        return {"pooled": jnp.mean(x, axis=(1, 2)), "features": x}
