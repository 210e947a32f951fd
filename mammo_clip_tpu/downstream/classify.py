"""Downstream classification: linear probe / full finetune over the CLIP encoder.

Capability parity with the reference classifier stack:
* ``BreastClipClassifier`` rebuilds the image encoder from the checkpoint-embedded
  config, loads ``image_encoder.*`` weights, optionally freezes it for linear probing,
  and puts a single Dense head on the pooled features (reference:
  Classifiers/models/breast_clip_classifier.py:6-57; lp-freeze :20-25).
* ``MammoEfficientNetClassifier`` is the pure-supervised baseline: EfficientNet + GeM
  pooling + 1-logit head (reference: breastclip/model/mamo_efficient_net.py:66-91).
* Hard-coded class-balance pos_weight tables (reference: train_classifier.py:113-141).
* Patient-laterality probability aggregation for RSNA CV scoring (reference:
  Classifiers/experiments.py:171-173 groupby(patient, laterality).mean()).

TPU-first details: the frozen (linear-probe) path wraps encoder features in
``stop_gradient`` AND keeps BatchNorm in inference mode, matching the reference's
custom ``train()`` that pins the encoder in eval (image_classification.py:50-61);
XLA then dead-code-eliminates the entire encoder backward pass, so an lp step costs
forward-only on the encoder.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.clip import efficientnet_variant
from ..models.efficientnet import EfficientNet
from ..ops.pooling import gem_pool

# reference: train_classifier.py:113-141 — BCE pos_weight per dataset/label (fold tables
# collapsed to their common value; RSNA's per-fold values are ~46.5).
POS_WEIGHTS: Dict[str, float] = {
    "rsna/cancer": 46.5,
    "vindr/Mass": 15.573306,
    "vindr/Suspicious_Calcification": 37.296728,
}


class MammoClassifier(nn.Module):
    """CLIP-encoder classifier. ``image_encoder_config`` comes from the pretrain
    checkpoint's embedded config (the cross-stack contract)."""

    image_encoder_config: Dict
    num_classes: int = 1
    freeze_encoder: bool = False  # True = linear probe ('_lp' arches)
    dtype: Any = jnp.float32

    def setup(self):
        # the SHARED encoder factory: every flag in the checkpoint-embedded
        # config (tpu_optimized/front/dense-width, s2d_exec, pooling, ...)
        # takes effect here too, so flagship checkpoints fine-tune downstream
        # (r3; factory names the module "image_encoder" = the weight-injection
        # contract the CLIs rely on)
        from ..models.clip import load_image_encoder

        self.encoder = load_image_encoder(dict(self.image_encoder_config),
                                          dtype=self.dtype)
        self.head = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")

    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        # Linear probe: encoder always in inference mode (BN running stats, no dropout),
        # gradients cut — reference keeps the frozen encoder in eval during training
        # (image_classification.py:50-61) and detaches params (breast_clip_classifier.py:20-25).
        enc_train = train and not self.freeze_encoder
        feats = self.encoder(images, train=enc_train)
        pooled = feats["pooled"]
        if self.freeze_encoder:
            pooled = jax.lax.stop_gradient(pooled)
        logits = self.head(pooled)
        return {
            "logits": logits,
            "pooled_features": pooled,
            "raw_features": feats["features"],
        }


class MammoEfficientNetClassifier(nn.Module):
    """Pure-supervised baseline ('pretrained_classifier'): EfficientNet + GeM + fc
    (reference: mamo_efficient_net.py:66-91, GeM p=3)."""

    variant: str = "b5"
    num_classes: int = 1
    gem_p: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = EfficientNet(
            variant=self.variant, in_channels=images.shape[-1], dtype=self.dtype,
            name="encoder",
        )(images, train=train)
        pooled = gem_pool(feats["features"], p=self.gem_p)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(pooled)
        return {"logits": logits, "pooled_features": pooled, "raw_features": feats["features"]}


def classifier_from_clip_checkpoint(
    clip_config: Dict,
    clip_params: Dict,
    num_classes: int,
    freeze_encoder: bool,
    dtype: Any = jnp.float32,
    head_rng: Optional[jax.Array] = None,
    example_shape=(1, 64, 64, 1),
):
    """Build a MammoClassifier and initialize its encoder from pretrain CLIP params.

    Mirrors the reference's strict image_encoder.* load (breast_clip_classifier.py:12-17):
    the encoder subtree is taken verbatim from the CLIP checkpoint; only the head is
    freshly initialized.
    """
    model = MammoClassifier(
        image_encoder_config=dict(clip_config["model"]["image_encoder"]),
        num_classes=num_classes,
        freeze_encoder=freeze_encoder,
        dtype=dtype,
    )
    rng = head_rng if head_rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros(example_shape, jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))({"params": rng}, dummy)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    assert "image_encoder" in clip_params["params"], "CLIP checkpoint missing image_encoder"
    params["image_encoder"] = clip_params["params"]["image_encoder"]
    if "batch_stats" in clip_params and "image_encoder" in clip_params["batch_stats"]:
        batch_stats["image_encoder"] = clip_params["batch_stats"]["image_encoder"]
    return model, {"params": params, "batch_stats": batch_stats}


def aggregate_rsna_predictions(df: pd.DataFrame, pred_col: str = "pred",
                               label_col: str = "cancer") -> pd.DataFrame:
    """Patient-laterality groupby-mean aggregation for RSNA scoring
    (reference: Classifiers/experiments.py:56-77,171-173)."""
    return (
        df.groupby(["patient_id", "laterality"])[[pred_col, label_col]]
        .mean()
        .reset_index()
    )
