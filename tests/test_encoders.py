"""ResNet / ViT encoder families + factory dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammo_clip_tpu.models import MammoCLIP, load_image_encoder
from mammo_clip_tpu.models.resnet import ResNet
from mammo_clip_tpu.models.vit import ViT, ViTConfig


def test_resnet_shapes():
    model = ResNet(variant="resnet50", in_channels=1)
    x = jnp.zeros((1, 64, 64, 1))
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    out = model.apply(v, x, train=False)
    assert out["pooled"].shape == (1, 2048)
    assert out["features"].shape == (1, 2, 2, 2048)


def test_vit_interpolated_positions():
    cfg = ViTConfig.tiny()
    model = ViT(cfg=cfg, in_channels=1)
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 1)), train=False))()
    # same params work at a different (non-base) resolution: pos embeddings interpolate
    out1 = model.apply(v, jnp.zeros((1, 32, 32, 1)), train=False)
    out2 = model.apply(v, jnp.zeros((1, 64, 48, 1)), train=False)
    assert out1["pooled"].shape == (1, cfg.hidden_size)
    assert out2["features"].shape == (1, 8, 6, cfg.hidden_size)


def test_factory_dispatch():
    enc = load_image_encoder({"name": "resnet101"})
    assert isinstance(enc, ResNet)
    enc2 = load_image_encoder({"name": "vit-base", "hidden_size": 32, "num_layers": 1,
                               "num_heads": 2, "mlp_dim": 64, "patch_size": 8, "base_grid": 4})
    assert isinstance(enc2, ViT)
    from mammo_clip_tpu.models.efficientnet import EfficientNet

    enc3 = load_image_encoder({"name": "tf_efficientnet_b5_ns-detect"})
    assert isinstance(enc3, EfficientNet) and enc3.variant == "b5"


def test_clip_with_vit_encoder():
    model_config = {
        "name": "clip_custom",
        "temperature": 0.07,
        "image_encoder": {"name": "vit-tiny", "model_type": "vit", "patch_size": 8,
                          "hidden_size": 32, "num_layers": 1, "num_heads": 2,
                          "mlp_dim": 64, "base_grid": 4},
        "text_encoder": {"pooling": "eos", "vocab_size": 64, "hidden_size": 32,
                         "num_layers": 1, "num_heads": 2, "intermediate_size": 64,
                         "max_position_embeddings": 32},
        "projection_head": {"name": "mlp", "proj_dim": 16, "dropout": 0.0},
    }
    model = MammoCLIP(model_config=model_config)
    batch = {
        "images": jnp.zeros((2, 32, 32, 1)),
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, train=False))()
    out = model.apply(v, batch, train=False)
    assert out["image_embeddings"].shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["text_embeddings"]), axis=1), 1.0, rtol=1e-5
    )


def test_swin_shapes_and_shifted_windows():
    from mammo_clip_tpu.models.swin import SwinConfig, SwinTransformer

    cfg = SwinConfig(patch_size=4, embed_dim=16, depths=(2, 2), num_heads=(2, 2), window=4)
    model = SwinTransformer(cfg=cfg, in_channels=1)
    # input must be divisible by patch*window*2^(stages-1) = 4*4*2 = 32
    x = jnp.zeros((2, 64, 32, 1))
    v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    out = model.apply(v, x, train=False)
    assert out["pooled"].shape == (2, 32)  # embed_dim * 2^(stages-1)
    assert out["features"].shape == (2, 8, 4, 32)
    assert np.all(np.isfinite(np.asarray(out["pooled"])))


def test_swin_factory_dispatch():
    from mammo_clip_tpu.models.swin import SwinTransformer

    enc = load_image_encoder({"name": "swin-tiny", "embed_dim": 16, "depths": (1, 1),
                              "num_heads": (2, 2), "window": 4})
    assert isinstance(enc, SwinTransformer)
