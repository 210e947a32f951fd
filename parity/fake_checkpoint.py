"""Byte-accurate fake of the PUBLIC Mammo-CLIP ``.tar`` checkpoint contract.

The public checkpoints (`/root/reference/README.md:363-374`: huggingface
shawn24/Mammo-CLIP b5-model-best-epoch-7.tar / b2-model-best-epoch-10.tar) are
unreachable from this zero-egress pod, so the import path is exercised against
a fake that reproduces the format byte-for-byte: the reference custom
EfficientNet state dict with its 3-channel RGB stem (imagetext.py:121 feeds
gray->RGB), the extra ``_fc`` head (ignored on import), real HF BertModel keys
at the BioClinicalBERT shape, ``module.`` DDP prefixes, and the embedded Hydra
config (reference trainer.py:220-229 save format).

Shared by tests/test_convert.py (consumer-path test) and
parity/run_parity.py --selftest (dry run of the real-data parity pipeline).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_EPOCH = {"b2": 10, "b5": 7}  # the public checkpoints' best epochs


def make_fake_public_tar(
    path: str,
    variant: str = "b2",
    image_hw: Tuple[int, int] = (128, 96),
    text_max_length: int = 24,
    seed: int = 0,
) -> str:
    """Write a reference-format ``.tar`` checkpoint with random weights at the
    REAL state-dict shapes for ``variant`` and return ``path``."""
    import torch

    from mammo_clip_tpu.models.efficientnet import (
        head_filters,
        scaled_block_args,
        stem_filters,
    )

    torch.manual_seed(seed)
    sd = {}

    def t(*shape):
        return torch.randn(*shape) * 0.05

    def bn(prefix, c):
        sd[prefix + ".weight"] = torch.ones(c) + 0.05 * torch.randn(c)
        sd[prefix + ".bias"] = 0.05 * torch.randn(c)
        sd[prefix + ".running_mean"] = 0.05 * torch.randn(c)
        sd[prefix + ".running_var"] = torch.ones(c)
        sd[prefix + ".num_batches_tracked"] = torch.tensor(100)

    # image encoder: the reference custom EfficientNet with its 3-channel stem
    p = "image_encoder."
    stem = stem_filters(variant)
    sd[p + "_conv_stem.weight"] = t(stem, 3, 3, 3)
    bn(p + "_bn0", stem)
    for i, a in enumerate(scaled_block_args(variant)):
        b = f"{p}_blocks.{i}."
        exp = a.in_filters * a.expand_ratio
        if a.expand_ratio != 1:
            sd[b + "_expand_conv.weight"] = t(exp, a.in_filters, 1, 1)
            bn(b + "_bn0", exp)
        sd[b + "_depthwise_conv.weight"] = t(exp, 1, a.kernel, a.kernel)
        bn(b + "_bn1", exp)
        sq = max(1, int(a.in_filters * a.se_ratio))
        sd[b + "_se_reduce.weight"] = t(sq, exp, 1, 1)
        sd[b + "_se_reduce.bias"] = t(sq)
        sd[b + "_se_expand.weight"] = t(exp, sq, 1, 1)
        sd[b + "_se_expand.bias"] = t(exp)
        sd[b + "_project_conv.weight"] = t(a.out_filters, exp, 1, 1)
        bn(b + "_bn2", a.out_filters)
    head = head_filters(variant)
    last = scaled_block_args(variant)[-1].out_filters
    sd[p + "_conv_head.weight"] = t(head, last, 1, 1)
    bn(p + "_bn1", head)
    sd[p + "_fc.weight"] = t(1, head)  # extra key (num_classes=1) — ignored
    sd[p + "_fc.bias"] = t(1)

    # text encoder: REAL HF BertModel keys at BioClinicalBERT shape
    from transformers import BertConfig, BertModel

    bert = BertModel(BertConfig(vocab_size=28996))
    for k, v in bert.state_dict().items():
        sd["text_encoder.text_encoder." + k] = v

    sd["image_projection.projection.weight"] = t(512, head)
    sd["image_projection.projection.bias"] = t(512)
    sd["text_projection.projection.weight"] = t(512, 768)
    sd["text_projection.projection.bias"] = t(512)
    sd["logit_scale"] = torch.tensor(float(np.log(1 / 0.07)))

    name = {"b2": "tf_efficientnetv2-detect", "b5": "tf_efficientnet_b5_ns-detect"}
    ref_cfg = {  # the reference's embedded Hydra config shape (trainer.py:220-229)
        "model": {
            "image_encoder": {"source": "cnn", "name": name[variant],
                              "pretrained": True, "model_type": "cnn"},
            "text_encoder": {"source": "huggingface", "gradient_checkpointing": False,
                             "name": "emilyalsentzer/Bio_ClinicalBERT",
                             "pooling": "eos"},
            "projection_head": {"name": "linear", "proj_dim": 512, "dropout": 0.1},
            "temperature": 0.07,
        },
        "base": {"image_size_h": image_hw[0], "image_size_w": image_hw[1],
                 "mean": 0.3089279, "std": 0.2505356,
                 "text_max_length": text_max_length},
    }
    torch.save({"model": {f"module.{k}": v for k, v in sd.items()},
                "optimizer": {}, "scheduler": {}, "config": ref_cfg,
                "epoch": _EPOCH.get(variant, 0), "train_loss": 0.41}, path)
    return path
