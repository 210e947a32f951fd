"""AOT-warm the persistent compile cache for a bench.py-shaped train step.

On this pod TPU compiles go through a remote compile service (CLAUDE.md): a
fresh B5-class train-step compile costs 10-40 min, but compiling does NOT
occupy the chip — only execution does. This script builds the exact train
step bench.py would build for a given recipe variant and lowers+compiles it
from abstract ``ShapeDtypeStruct`` inputs (zero device execution, zero data
transfer), so the executable lands in ``.jax_cache`` while the chip is busy
with something else (e.g. a real-scale learning arm). When bench.py later
jits the same step, the cache key (unoptimized HLO + compile options)
matches and startup drops to ~2-4 min.

Usage (overlap with an arm run):
    python benchmarks/precompile_step.py             # bench.py flagship (amp + K=5)
    python benchmarks/precompile_step.py --compat    # reference path (fp32, K=1)

The construction below mirrors bench.py line-for-line (same config mutations,
same preprocess closure, same donate flag) — if bench.py's recipe changes,
change this file too, or the cache entry is for a stale HLO and simply goes
unused (no correctness risk).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--compat", action="store_true")
    ap.add_argument("--no-amp-attn", action="store_true",
                    help="disable the BERT torch-AMP attention-score storage "
                    "(on by default for the flagship, matching bench.py)")
    ap.add_argument("--steps-per-call", type=int, default=None,
                    help="fused multi-step call width (default: bench.py's — "
                    "5 for the flagship, 1 for --compat)")
    ap.add_argument("--trimmed", action="store_true",
                    help="apply the four opt-in capacity trims (slim3/5/6/4 — "
                    "demoted from the default recipe in r4: the graded gate "
                    "could not fail the over-cut control, BASELINE.md r4)")
    ap.add_argument("--slim-stage7", type=int, default=0,
                    help="also apply tpu_slim_stage7=<N> on top of the trims")
    args = ap.parse_args(argv)
    # bench.py's defaults for the variant (keep the two in lockstep — the
    # whole point is a cache entry whose HLO matches what bench.py jits)
    amp_attn = not args.compat and not args.no_amp_attn
    k_steps = args.steps_per_call if args.steps_per_call else (1 if args.compat else 5)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from mammo_clip_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from mammo_clip_tpu.core.config import default_pretrain_config
    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.ops.augment import AugmentConfig, augment_two_views
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
        warmup_cosine_sq_schedule,
    )

    BATCH = 8  # bench.py BATCH

    cfg = default_pretrain_config("b5")
    cfg.model.image_encoder.remat = True
    if not args.compat:
        cfg.model.image_encoder.tpu_optimized = True
        cfg.model.image_encoder.remat = False
        if args.trimmed:
            cfg.model.image_encoder.tpu_slim_stage3 = 256
            cfg.model.image_encoder.tpu_slim_stage5 = 768
            cfg.model.image_encoder.tpu_slim_stage6 = 1536
            cfg.model.image_encoder.tpu_slim_stage4 = 512
        if args.slim_stage7:
            cfg.model.image_encoder.tpu_slim_stage7 = args.slim_stage7
    if amp_attn:
        cfg.model.text_encoder.amp_attn_scores = True
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    seq = cfg.data.text_max_length

    model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)
    loss_fn = build_loss(cfg.loss.to_dict())
    schedule = warmup_cosine_sq_schedule(cfg.optimizer.lr, total_steps=10_000, warmup_steps=500)
    tx = build_optimizer(cfg.optimizer.to_dict(), schedule)

    aug = AugmentConfig.from_dict(cfg.augment.to_dict())
    mean, std = cfg.data.mean, cfg.data.std

    def preprocess(batch, rng):
        batch = dict(batch)
        batch["images"], batch["image_views"] = augment_two_views(
            batch["images"], batch["image_views"], rng, aug, mean, std, train=True,
            out_dtype=None if args.compat else jnp.bfloat16,
        )
        return batch

    sds = jax.ShapeDtypeStruct
    batch_sds = {
        "images": sds((BATCH, h, w, 1), jnp.uint8),
        "image_views": sds((BATCH, h, w, 1), jnp.uint8),
        "input_ids": sds((BATCH, seq), jnp.int32),
        "attention_mask": sds((BATCH, seq), jnp.int32),
        "input_ids2": sds((BATCH, seq), jnp.int32),
        "attention_mask2": sds((BATCH, seq), jnp.int32),
    }
    init_example_sds = dict(batch_sds)
    init_example_sds["images"] = sds((BATCH, h, w, 1), jnp.float32)
    init_example_sds["image_views"] = sds((BATCH, h, w, 1), jnp.float32)

    # Key shape depends on the configured PRNG impl (unsafe_rbg keys are
    # uint32[4]); derive it abstractly instead of hardcoding.
    rng_sds = jax.eval_shape(jax.random.PRNGKey, sds((), jnp.uint32))

    # Abstract state: same treedef as bench.py's (tx rides along as a static
    # field), ShapeDtypeStruct leaves — nothing ever touches the device.
    state_sds = jax.eval_shape(
        lambda rng, ex: create_train_state(model, ex, tx, rng),
        rng_sds, init_example_sds,
    )

    if k_steps > 1:
        from mammo_clip_tpu.train import make_train_multistep

        train_step = make_train_multistep(model, loss_fn, preprocess=preprocess, donate=True)
        batch_sds = {k: sds((k_steps,) + v.shape, v.dtype)
                     for k, v in batch_sds.items()}
    else:
        train_step = make_train_step(model, loss_fn, preprocess=preprocess, donate=True)
    t0 = time.perf_counter()
    lowered = train_step.lower(state_sds, batch_sds, rng_sds)
    t1 = time.perf_counter()
    print(f"lowered in {t1 - t0:.1f}s; compiling (remote service)...", file=sys.stderr)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    mem = getattr(compiled, "memory_analysis", lambda: None)()
    print(f"compiled in {t2 - t1:.1f}s; cache warmed for "
          f"{'compat' if args.compat else 'flagship'}"
          f"{'+amp_attn_scores' if amp_attn else ''}"
          f"{f'+K={k_steps}' if k_steps > 1 else ''}"
          f"{f'+slim7={args.slim_stage7}' if args.slim_stage7 else ''}")
    if mem is not None:
        try:
            print(f"temp allocation: {mem.temp_size_in_bytes / 1e9:.2f} GB", file=sys.stderr)
        except Exception:
            pass


if __name__ == "__main__":
    main()
