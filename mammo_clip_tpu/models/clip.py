"""MammoCLIP dual-encoder model.

Capability parity with the reference's ``BreastClip`` module
(reference: breastclip/model/clip.py:14-114): EfficientNet image encoder + BERT text
encoder + projection heads + learnable ``logit_scale`` initialized to log(1/temperature)
(clip.py:39-43, temperature 0.07). The forward emits L2-normalized embeddings for one or
two image views and one or two texts (clip.py:80-114); in-batch labels are derived by the
loss, not stored here.

TPU-first notes:
* images are NHWC grayscale, bf16 activations; embeddings are normalized in fp32 for
  numerical stability of the contrastive logits;
* under pjit/GSPMD the batch axis is sharded over the mesh and the contrastive loss is
  written over the global batch (see losses/clip_loss.py), so no explicit all-gather
  appears at model level;
* the reference's projection-head typo (clip.py:105 projects ``text_features_g`` instead
  of ``text_features_g2`` in the no-projection branch) is NOT replicated.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .bert import BertConfig, BertEncoder, pool_text
from .efficientnet import EfficientNet
from .projection import make_projection_head


def bert_config_from_model_config(model_config: Dict) -> BertConfig:
    t = model_config["text_encoder"]
    return BertConfig(
        vocab_size=t.get("vocab_size", 28996),
        hidden_size=t.get("hidden_size", 768),
        num_layers=t.get("num_layers", 12),
        num_heads=t.get("num_heads", 12),
        intermediate_size=t.get("intermediate_size", 3072),
        max_position_embeddings=t.get("max_position_embeddings", 512),
        remat=t.get("gradient_checkpointing", False),
        fused_qkv=t.get("fused_qkv", False),
        amp_attn_scores=t.get("amp_attn_scores", False),
        seq_parallel=t.get("seq_parallel", False),
    )


def efficientnet_variant(name: str) -> str:
    """Map encoder names (incl. the reference's quirk aliases) to a variant.

    Reference quirk table (breastclip/model/modules/__init__.py:35-46):
    'tf_efficientnetv2-detect' -> efficientnet-b2, 'tf_efficientnet_b5_ns-detect' -> b5.
    """
    aliases = {
        "tf_efficientnetv2-detect": "b2",
        "tf_efficientnet_b5_ns-detect": "b5",
    }
    if name in aliases:
        return aliases[name]
    if name.startswith(("efficientnet-", "tf_efficientnet_")):
        for variant in ("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7"):
            if variant in name:
                return variant
    raise ValueError(f"unknown image encoder name: {name}")


def load_image_encoder(config: Dict, dtype: Any = jnp.float32) -> nn.Module:
    """Image-encoder factory (reference: breastclip/model/modules/__init__.py:11-56).

    Every encoder returns a dict with 'pooled' (the global representation: GAP for
    CNNs, CLS token for ViT) and 'features' (the raw final feature map), so the CLIP
    module, classifiers, detector, and Mammo-FActOR share one contract.
    """
    name = str(config.get("name", "efficientnet-b5"))
    if name.startswith("resnet"):
        from .resnet import ResNet

        return ResNet(variant=name, in_channels=config.get("in_channels", 1),
                      dtype=dtype, name="image_encoder")
    if name.startswith("swin") or config.get("model_type") == "swin":
        from .swin import SwinConfig, SwinTransformer

        swin_cfg = SwinConfig(
            patch_size=config.get("patch_size", 4),
            embed_dim=config.get("embed_dim", 96),
            depths=tuple(config.get("depths", (2, 2, 6, 2))),
            num_heads=tuple(config.get("num_heads", (3, 6, 12, 24))),
            window=config.get("window", 8),
        )
        return SwinTransformer(cfg=swin_cfg, in_channels=config.get("in_channels", 1),
                               dtype=dtype, name="image_encoder")
    if name.startswith("vit") or config.get("model_type") == "vit":
        from .vit import ViT, ViTConfig

        vit_cfg = ViTConfig(
            patch_size=config.get("patch_size", 16),
            hidden_size=config.get("hidden_size", 768),
            num_layers=config.get("num_layers", 12),
            num_heads=config.get("num_heads", 12),
            mlp_dim=config.get("mlp_dim", 3072),
            base_grid=config.get("base_grid", 14),
        )
        return ViT(cfg=vit_cfg, in_channels=config.get("in_channels", 1),
                   dtype=dtype, name="image_encoder")
    return EfficientNet(
        variant=efficientnet_variant(name),
        in_channels=config.get("in_channels", 1),
        feature_taps=tuple(config.get("feature_taps", ())),
        drop_connect_rate=config.get("drop_connect_rate", 0.2),
        remat=config.get("remat", False),
        remat_max_reduction=config.get("remat_max_reduction", 16),
        packed_residuals=config.get("packed_residuals", False),
        fused_mbconv=config.get("fused_mbconv", False),
        s2d_exec=config.get("s2d_exec", False),
        tpu_optimized=config.get("tpu_optimized", False),
        tpu_front_blocks=config.get("tpu_front_blocks", 2),
        tpu_front_expand=config.get("tpu_front_expand", 1),
        tpu_dense_widths=config.get("tpu_dense_widths", True),
        tpu_slim_stage3=config.get("tpu_slim_stage3", 0),
        tpu_slim_stage4=config.get("tpu_slim_stage4", 0),
        tpu_slim_stage5=config.get("tpu_slim_stage5", 0),
        tpu_slim_stage6=config.get("tpu_slim_stage6", 0),
        tpu_slim_stage7=config.get("tpu_slim_stage7", 0),
        quant_int8_k5=config.get("quant_int8_k5", False),
        pooling=config.get("pooling", "avg"),
        dtype=dtype,
        name="image_encoder",
    )


class MammoCLIP(nn.Module):
    """Dual encoder. ``model_config`` follows core.config.default_pretrain_config."""

    model_config: Dict
    dtype: Any = jnp.float32

    def setup(self):
        mc = dict(self.model_config)
        ie = mc["image_encoder"]
        self.image_encoder = load_image_encoder(dict(ie), dtype=self.dtype)
        self.text_encoder = BertEncoder(
            bert_config_from_model_config(mc), dtype=self.dtype, name="text_encoder"
        )
        self.text_pooling = mc["text_encoder"].get("pooling", "eos")
        self.has_projection = "projection_head" in mc
        if self.has_projection:
            ph = dict(mc["projection_head"])
            self.image_projection = make_projection_head(ph, dtype=self.dtype)
            self.text_projection = make_projection_head(ph, dtype=self.dtype)
        temperature = mc.get("temperature", 0.07)
        self.logit_scale = self.param(
            "logit_scale",
            lambda rng: jnp.asarray(math.log(1.0 / temperature), jnp.float32),
        )

    # -- encoders ----------------------------------------------------------------------
    def encode_image(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Images NHWC -> pooled features (N, C). CNN path of reference clip.py:46-54."""
        return self.image_encoder(images, train=train)["pooled"]

    def encode_text(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        hidden = self.text_encoder(input_ids, attention_mask, deterministic=not train)
        return pool_text(hidden, attention_mask, self.text_pooling)

    def _project_normalize(self, feats: jnp.ndarray, projection, train: bool) -> jnp.ndarray:
        emb = projection(feats, deterministic=not train) if self.has_projection else feats
        emb = emb.astype(jnp.float32)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def embed_image(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """encode -> project -> L2 normalize (reference encode_image_normalized)."""
        feats = self.encode_image(images, train=train)
        return self._project_normalize(
            feats, self.image_projection if self.has_projection else None, train
        )

    def embed_text(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        feats = self.encode_text(input_ids, attention_mask, train=train)
        return self._project_normalize(
            feats, self.text_projection if self.has_projection else None, train
        )

    # -- full forward --------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        """batch keys: images (N,H,W,C); input_ids/attention_mask (N,S); optional
        image_views, input_ids2/attention_mask2 for the multi-positive loss."""
        out = {
            "image_embeddings": self.embed_image(batch["images"], train=train),
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if "input_ids2" in batch and "image_views" in batch:
            # ONE BERT invocation for both texts (concat along batch): exact —
            # no op in the text tower crosses the batch — and 2x the matmul
            # batch amortizes the per-call overheads. The IMAGE towers stay
            # separate on purpose: BatchNorm batch statistics over a joint
            # 2N-view batch would change the training semantics vs the
            # reference (one forward per view set, trainer_ddp.py:277-300).
            n = batch["input_ids"].shape[0]
            both = self.embed_text(
                jnp.concatenate([batch["input_ids"], batch["input_ids2"]], 0),
                jnp.concatenate([batch["attention_mask"],
                                 batch["attention_mask2"]], 0),
                train=train,
            )
            out["text_embeddings"] = both[:n]
            out["text_embeddings2"] = both[n:]
            out["image_view_embeddings"] = self.embed_image(
                batch["image_views"], train=train)
        else:
            out["text_embeddings"] = self.embed_text(
                batch["input_ids"], batch["attention_mask"], train=train
            )
        return out
