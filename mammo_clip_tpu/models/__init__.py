"""Model zoo factory (reference: breastclip/model/__init__.py:10-21)."""

from typing import Any, Dict

import jax.numpy as jnp

from .bert import BertConfig, BertEncoder, pool_text
from .clip import MammoCLIP, bert_config_from_model_config, efficientnet_variant, load_image_encoder
from .resnet import ResNet
from .vit import ViT, ViTConfig
from .efficientnet import (
    EfficientNet,
    default_detector_taps,
    head_filters,
    scaled_block_args,
    tap_channels,
)
from .projection import LinearProjectionHead, MLPProjectionHead, make_projection_head


def build_model(model_config: Dict, dtype: Any = jnp.float32):
    """name -> model dispatch, mirroring the reference factory."""
    name = model_config.get("name", "clip_custom")
    if name == "clip_custom":
        return MammoCLIP(model_config=dict(model_config), dtype=dtype)
    raise KeyError(f"unknown model name: {name}")
