"""Every shipped config in configs/ must load and build its full model stack
(the reference ships its recipes as Hydra YAML groups; these are the analogue)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_shipped_config_builds(path):
    from mammo_clip_tpu.core.config import load_config
    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.train.optim import build_optimizer
    from mammo_clip_tpu.train.trainer import make_clip_preprocess

    cfg = load_config(path)
    model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)
    loss_fn = build_loss(cfg.loss.to_dict())
    tx = build_optimizer(cfg.optimizer.to_dict(), lambda s: 1e-4)
    assert model is not None and loss_fn is not None and tx is not None

    # the augment block parses and the preprocess hook runs on a tiny batch
    preprocess = make_clip_preprocess(cfg)
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 32, 32, 1),
                                                         dtype=np.uint8))
    out = preprocess({"images": imgs}, jax.random.PRNGKey(0))
    assert out["images"].shape == imgs.shape
    if cfg.model.image_encoder.get("tpu_optimized", False):
        assert out["images"].dtype == jnp.bfloat16  # automatic bf16 aug output
    assert bool(jnp.isfinite(out["images"].astype(jnp.float32)).all())
