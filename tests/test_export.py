"""AOT serving export (utils/export.py): StableHLO roundtrip with baked params
matches the live model, and the artifact carries its serving manifest."""

import jax
import jax.numpy as jnp
import numpy as np


def test_serving_export_roundtrip(tmp_path):
    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.utils.export import ServingModule, export_clip_serving

    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    batch = {
        "images": jnp.asarray(rng.standard_normal((2, h, w, 1)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.model.text_encoder.vocab_size, (2, s)), jnp.int32),
        "attention_mask": jnp.ones((2, s), jnp.int32),
    }
    variables = jax.jit(lambda b: model.init({"params": jax.random.PRNGKey(0)},
                                             b, train=False))(batch)

    out_dir = str(tmp_path / "serving")
    files = export_clip_serving(model, variables, (h, w), s, batch=2,
                                out_dir=out_dir)
    assert set(files) == {"image_fn", "text_fn", "manifest"}

    srv = ServingModule(out_dir)
    assert srv.manifest["embedding_dim"] == cfg.model.projection_head.proj_dim

    img_ref = model.apply(variables, batch["images"], train=False,
                          method=model.embed_image)
    txt_ref = model.apply(variables, batch["input_ids"],
                          batch["attention_mask"], train=False,
                          method=model.embed_text)
    np.testing.assert_allclose(np.asarray(srv.embed_images(batch["images"])),
                               np.asarray(img_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(srv.embed_texts(batch["input_ids"], batch["attention_mask"])),
        np.asarray(txt_ref), rtol=1e-5, atol=1e-6)


def test_export_cli_from_checkpoint(tmp_path):
    """checkpoint dir -> CLI -> loadable serving artifacts."""
    import json

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        warmup_cosine_sq_schedule,
    )
    from mammo_clip_tpu.train.checkpoint import save_checkpoint
    from mammo_clip_tpu.utils.export import ServingModule

    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    batch = {
        "images": jnp.asarray(rng.standard_normal((2, h, w, 1)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.model.text_encoder.vocab_size, (2, s)), jnp.int32),
        "attention_mask": jnp.ones((2, s), jnp.int32),
    }
    tx = build_optimizer(cfg.optimizer.to_dict(),
                         warmup_cosine_sq_schedule(cfg.optimizer.lr, 10, 0))
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, config=cfg.to_dict(), max_to_keep=1)

    from mammo_clip_tpu.cli import export as export_cli

    out = str(tmp_path / "serving")
    export_cli.main(["--checkpoint", ckpt, "--out", out, "--batch", "2"])
    srv = ServingModule(out)
    emb = srv.embed_images(batch["images"])
    assert emb.shape == (2, cfg.model.projection_head.proj_dim)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_eval_loader_serves_ema_weights(tmp_path):
    """load_clip_for_eval(use_ema=True) returns the EMA leaves and refuses
    checkpoints without them."""
    import pytest

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.eval.loading import load_clip_for_eval
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        warmup_cosine_sq_schedule,
    )
    from mammo_clip_tpu.train.checkpoint import save_checkpoint

    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    batch = {
        "images": jnp.asarray(rng.standard_normal((2, h, w, 1)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.model.text_encoder.vocab_size, (2, s)), jnp.int32),
        "attention_mask": jnp.ones((2, s), jnp.int32),
    }
    tx = build_optimizer(cfg.optimizer.to_dict(),
                         warmup_cosine_sq_schedule(cfg.optimizer.lr, 10, 0))
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0),
                               ema_decay=0.9)
    # make EMA distinguishable from params
    state = state.replace(ema_params=jax.tree_util.tree_map(
        lambda p: p + 1.0, state.params))
    ckpt = str(tmp_path / "ema_ckpt")
    save_checkpoint(ckpt, state, config=cfg.to_dict(), max_to_keep=1)

    _, v_raw, _ = load_clip_for_eval(ckpt)
    _, v_ema, _ = load_clip_for_eval(ckpt, use_ema=True)
    a = jax.tree_util.tree_leaves(v_raw["params"])[0]
    b = jax.tree_util.tree_leaves(v_ema["params"])[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 1.0, rtol=1e-6)

    # checkpoint without EMA refuses use_ema
    state2 = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    ckpt2 = str(tmp_path / "plain_ckpt")
    save_checkpoint(ckpt2, state2, config=cfg.to_dict(), max_to_keep=1)
    with pytest.raises(AssertionError):
        load_clip_for_eval(ckpt2, use_ema=True)
