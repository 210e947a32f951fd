"""The measured bench recipe in ONE place.

Three entry points build the same production train step and MUST stay
HLO-identical: ``bench.py`` (the driver headline), ``benchmarks/
precompile_step.py`` (AOT cache warmer — its entire value is that bench.py
later hits its cache entry), and ``benchmarks/real_scale_learning.py``
(real-scale quality arms — their evidence should certify the program that
actually ships, and their startup rides the same persistent compile cache:
a fresh B5-class compile costs 10-40 min on this pod's remote compile
service). Before r4 each file hand-copied ~80 lines of construction and
relied on "change this file too" comments; a recipe tweak that missed one
copy silently produced a stale cache entry or quality evidence for the
wrong program. This module is the single source of truth.

Recipe provenance: BASELINE.md r2-r4 decision record (structural results,
probe ledger, re-gating verdict). Reference recipe being mirrored:
``configs/pre_train_b5_clip.yaml`` + the DDP hot loop
(``trainer_ddp.py:266-344``).

Callers must set ``jax.config.update("jax_default_prng_impl",
"unsafe_rbg")`` and enable the persistent compile cache BEFORE building —
both change the compiled program / cache key.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

# The four r3 capacity trims, DEMOTED to opt-in in r4 (the graded gate could
# not fail a 0.68x-FLOP control, so synthetic evidence cannot certify them at
# B5-class quality — BASELINE.md r4 "re-gating verdict").
TRIMMED_SLIM = {3: 256, 5: 768, 6: 1536, 4: 512}

# bench.py's batch: reference ships 4/GPU (configs/dataloader/
# dataloader_b5.yaml:6); on the 16GB v5e chip bs8 is 2.6x faster per image.
BENCH_BATCH = 8
BENCH_TOTAL_STEPS = 10_000
BENCH_WARMUP_STEPS = 500


def default_steps_per_call(compat: bool) -> int:
    """bench.py's fused-call width: K=5 amortizes the relay's ~12 ms per-call
    dispatch latency to ~2.4 ms (r4 promotion); the compat path stays at the
    reference's one-optimizer-step-per-dispatch semantics."""
    return 1 if compat else 5


def bench_recipe_config(
    compat: bool = False,
    trimmed: bool = False,
    amp_attn: bool = True,
    slim: Optional[Dict[int, int]] = None,
):
    """The measured recipe's config (bench.py's exact mutations).

    compat: reference-EXACT checkpoint-compatible path (library default
        config + remat; fp32 attention scores, fp32 augment output).
    trimmed: apply the four demoted r3 capacity trims (TRIMMED_SLIM).
    amp_attn: BERT torch-AMP attention-score storage (r4 promotion;
        flagship-only — the compat path must stay reference-exact).
    slim: explicit {stage: expanded_width} overrides for probe arms
        (flagship-only; mutually exclusive with ``trimmed``).
    """
    from mammo_clip_tpu.core.config import default_pretrain_config

    if compat and (trimmed or slim):
        raise ValueError("capacity trims only apply to the flagship path")
    if trimmed and slim:
        raise ValueError("pass either trimmed=True or explicit slim overrides")

    cfg = default_pretrain_config("b5")
    # remat required on the compat path: bf16 tile-padding expansion (2-4x) on
    # the low-channel early feature maps blows 16GB HBM at bs4 without it
    cfg.model.image_encoder.remat = True
    if not compat:
        # TPU-native flagship: space-to-depth front end, C=128-dense early
        # stages (BASELINE.md round-2 structural results: 2.2x the compatible
        # path on this chip). Its activations are small enough that remat is
        # a net loss — run without it (12.8 GB temp at bs8).
        cfg.model.image_encoder.tpu_optimized = True
        cfg.model.image_encoder.remat = False
        for stage, width in (TRIMMED_SLIM if trimmed else (slim or {})).items():
            setattr(cfg.model.image_encoder, f"tpu_slim_stage{stage}", width)
        if amp_attn:
            # r4: BERT attention logits/probs stored in bf16 with fp32 softmax
            # math (torch-AMP semantics, models/bert.py) — -6 ms/step measured,
            # numerics equivalence-tested vs the fp32 path (tests/test_convert)
            cfg.model.text_encoder.amp_attn_scores = True
    return cfg


def build_bench_train(
    cfg,
    *,
    compat: bool,
    k_steps: int,
    lr_scale: float = 1.0,
    donate: bool = True,
) -> Tuple[object, Callable, object, Callable, Callable]:
    """Build the measured train step from a ``bench_recipe_config`` cfg.

    Returns ``(model, loss_fn, tx, preprocess, train_step)``. ``train_step``
    is the fused K-step call when ``k_steps > 1`` (feed (K, B, ...) stacked
    batches) and the single step otherwise — in both cases jitted with the
    donated-state signature bench.py measures.
    """
    import jax.numpy as jnp

    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.ops.augment import AugmentConfig, augment_two_views
    from mammo_clip_tpu.train import (
        build_optimizer,
        make_train_multistep,
        make_train_step,
        warmup_cosine_sq_schedule,
    )

    model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)
    loss_fn = build_loss(cfg.loss.to_dict())
    schedule = warmup_cosine_sq_schedule(
        cfg.optimizer.lr * lr_scale,
        total_steps=BENCH_TOTAL_STEPS, warmup_steps=BENCH_WARMUP_STEPS)
    tx = build_optimizer(cfg.optimizer.to_dict(), schedule)

    aug = AugmentConfig.from_dict(cfg.augment.to_dict())
    mean, std = cfg.data.mean, cfg.data.std

    def preprocess(batch, rng):
        batch = dict(batch)
        # both views in ONE warp invocation (halves the fixed per-call costs);
        # the flagship emits bf16 (the encoder casts at entry anyway — halves
        # the full-res bytes between warp and stem)
        batch["images"], batch["image_views"] = augment_two_views(
            batch["images"], batch["image_views"], rng, aug, mean, std,
            train=True, out_dtype=None if compat else jnp.bfloat16,
        )
        return batch

    if k_steps > 1:
        train_step = make_train_multistep(
            model, loss_fn, preprocess=preprocess, donate=donate)
    else:
        train_step = make_train_step(
            model, loss_fn, preprocess=preprocess, donate=donate)
    return model, loss_fn, tx, preprocess, train_step
