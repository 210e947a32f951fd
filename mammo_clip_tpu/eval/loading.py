"""Checkpoint -> (model, variables, config) loading for evaluation.

Accepts BOTH checkpoint formats, preserving the reference's cross-stack contract
(checkpoint embeds its model config; reference evaluator.py:26-48 rebuilds from it):

* native Orbax directories written by train.checkpoint.save_checkpoint;
* reference torch ``.tar`` files (public HuggingFace checkpoints), imported via
  convert/torch_import.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from ..core.config import Config, default_pretrain_config
from ..models import build_model


def _reference_config_to_ours(ref_cfg: Dict) -> Config:
    """Map the reference's embedded Hydra config to our schema (best-effort)."""
    cfg = default_pretrain_config("b5")
    model = ref_cfg.get("model", {})
    name = model.get("image_encoder", {}).get("name", "")
    if name:
        cfg.model.image_encoder.name = name
    base = ref_cfg.get("base", {})
    for src, dst in [
        ("image_size_h", "image_size_h"),
        ("image_size_w", "image_size_w"),
        ("mean", "mean"),
        ("std", "std"),
        ("text_max_length", "text_max_length"),
    ]:
        if src in base:
            cfg.data[dst] = base[src]
    ph = model.get("projection_head")
    if ph:
        cfg.model.projection_head = Config(
            {"name": ph.get("name", "linear"), "proj_dim": ph.get("proj_dim", 512),
             "dropout": ph.get("dropout", 0.1)}
        )
    if "temperature" in model:
        cfg.model.temperature = model["temperature"]
    pooling = model.get("text_encoder", {}).get("pooling")
    if pooling:
        cfg.model.text_encoder.pooling = pooling
    return cfg


def load_clip_for_eval(path: str, dtype: Any = jnp.float32,
                       use_ema: bool = False) -> Tuple[Any, Dict, Config]:
    """Returns (MammoCLIP model, {'params','batch_stats'}, config).

    ``use_ema=True`` serves the exponential-moving-average weights when the
    checkpoint carries them (train with ``optimizer.ema_decay``); errors if
    requested but absent (silently evaluating the raw weights would be a
    quality-reporting hazard). Torch ``.tar`` imports never carry EMA."""
    if path.endswith(".tar") or path.endswith(".pt") or path.endswith(".pth"):
        from ..convert.torch_import import convert_clip_checkpoint

        variables, ref_cfg = convert_clip_checkpoint(path)
        cfg = _reference_config_to_ours(ref_cfg or {})
        model = build_model(cfg.model.to_dict(), dtype=dtype)
        return model, variables, cfg

    # Orbax directory (either the run dir containing checkpoints/, or a step dir root)
    import orbax.checkpoint as ocp

    root = path
    if os.path.isdir(os.path.join(path, "checkpoints")):
        root = os.path.join(path, "checkpoints")
    with ocp.CheckpointManager(os.path.abspath(root)) as mgr:
        step = mgr.latest_step()
        assert step is not None, f"no checkpoint under {root}"
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
    cfg_path = os.path.join(root, str(step), "config.json")
    assert os.path.exists(cfg_path), "checkpoint missing embedded config.json"
    with open(cfg_path) as f:
        cfg = Config.from_json(f.read())
    model = build_model(cfg.model.to_dict(), dtype=dtype)
    params = restored["params"]
    if use_ema:
        assert "ema_params" in restored, (
            f"use_ema requested but checkpoint at {root} has no ema_params "
            "(train with optimizer.ema_decay > 0)")
        params = restored["ema_params"]
    variables = {"params": params, "batch_stats": restored.get("batch_stats", {})}
    return model, variables, cfg
