"""Config-driven combined loss (reference: breastclip/loss/__init__.py:9-28 +
combined_loss.py:6-29).

``build_loss(loss_config)`` returns a pure function ``loss_fn(outputs, batch, is_train)
-> dict`` with per-loss sub-terms plus ``"total"`` = sum(loss * loss_ratio). Losses with
``loss_ratio == 0`` are skipped, as in the reference factory.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from .classification import bce_with_logits_loss
from .clip_loss import contrastive_clip_loss, multi_positive_clip_loss

LossFn = Callable[[Dict, Dict, bool], Dict[str, jnp.ndarray]]


def build_loss(all_loss_config: Dict) -> LossFn:
    entries = []
    for name, cfg in all_loss_config.items():
        cfg = dict(cfg)
        ratio = cfg.pop("loss_ratio", 1.0)
        if ratio == 0.0:
            continue
        if name == "breast_clip":
            entries.append(("contrastive", ratio, "breast_clip", cfg))
        elif name == "breast_clip_contrastive":
            entries.append(("contrastive", ratio, "breast_clip_contrastive", cfg))
        elif name == "classification":
            entries.append(("classification", ratio, "classification", cfg))
        else:
            raise KeyError(f"Unknown loss: {name}")
    keys = [e[0] for e in entries]
    if len(set(keys)) != len(keys):
        # breast_clip and breast_clip_contrastive both report under
        # 'contrastive' (the reference treats them as alternatives,
        # loss/__init__.py); letting both through would silently overwrite
        # the first's terms in the returned dict
        raise ValueError(f"duplicate loss output keys {keys}: enable only one "
                         "contrastive objective (or set loss_ratio: 0)")

    def loss_fn(outputs: Dict, batch: Dict, is_train: bool = True) -> Dict[str, jnp.ndarray]:
        loss_dict: Dict[str, jnp.ndarray] = {}
        total = jnp.asarray(0.0, jnp.float32)
        for key, ratio, kind, cfg in entries:
            if kind == "breast_clip":
                sub = multi_positive_clip_loss(
                    image_embeddings=outputs["image_embeddings"],
                    text_embeddings=outputs["text_embeddings"],
                    text_embeddings2=outputs.get("text_embeddings2"),
                    image_view_embeddings=outputs.get("image_view_embeddings"),
                    logit_scale=outputs["logit_scale"],
                    is_train=is_train,
                    **cfg,
                )
            elif kind == "breast_clip_contrastive":
                sub = contrastive_clip_loss(
                    image_embeddings=outputs["image_embeddings"],
                    text_embeddings=outputs["text_embeddings"],
                    logit_scale=outputs["logit_scale"],
                    is_train=is_train,
                    **cfg,
                )
            else:
                sub = {
                    "classification": bce_with_logits_loss(
                        outputs["cls_pred"], batch["target_class"], **cfg
                    )
                }
            main = sub[key]  # every loss kind reports under its own key
            for k, v in sub.items():
                if k != key:
                    loss_dict[f"{key}/{k}"] = v
            loss_dict[key] = main
            total = total + ratio * main
        loss_dict["total"] = total
        return loss_dict

    return loss_fn
