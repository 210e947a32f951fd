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

HLO identity with bench.py is BY CONSTRUCTION: both call
``mammo_clip_tpu.train.recipes`` (``bench_recipe_config`` +
``build_bench_train``), the single source of truth for the measured recipe
(before r4 the construction was hand-copied here and drift produced silently
unused cache entries). ``--lower-only`` prints a source-metadata-stripped
hash of the lowered HLO instead of compiling — the regression check that any
two recipe entry points still build the same program.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stripped_hlo_hash(lowered) -> str:
    """sha256 of the lowered StableHLO text with source-location metadata
    removed — the same canonicalization idea as jax's compile-cache key, so
    equal hashes mean 'same cache entry' even when the building code moved
    between files."""
    text = lowered.as_text()
    text = re.sub(r'loc\("[^"]*"\([^)]*\)\)', "loc(stripped)", text)
    text = re.sub(r"#loc\d* = .*", "", text)
    text = re.sub(r" loc\(#?[^)]*\)", "", text)
    return hashlib.sha256(text.encode()).hexdigest()


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
    ap.add_argument("--lower-only", action="store_true",
                    help="skip the (remote) compile: print the metadata-"
                    "stripped HLO hash and exit — for recipe-identity checks "
                    "on any backend")
    args = ap.parse_args(argv)
    if args.compat and (args.trimmed or args.no_amp_attn or args.slim_stage7):
        ap.error("--trimmed/--no-amp-attn/--slim-stage7 only modify the "
                 "flagship recipe; --compat is reference-exact by definition")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from mammo_clip_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from mammo_clip_tpu.train import create_train_state
    from mammo_clip_tpu.train.recipes import (
        BENCH_BATCH as BATCH,
        bench_recipe_config,
        build_bench_train,
        default_steps_per_call,
    )

    slim = {7: args.slim_stage7} if args.slim_stage7 else None
    if args.trimmed and slim:
        from mammo_clip_tpu.train.recipes import TRIMMED_SLIM

        slim = dict(TRIMMED_SLIM, **slim)
    cfg = bench_recipe_config(
        compat=args.compat, trimmed=args.trimmed and not slim,
        amp_attn=not args.no_amp_attn, slim=slim)
    k_steps = args.steps_per_call or default_steps_per_call(args.compat)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    seq = cfg.data.text_max_length

    model, loss_fn, tx, preprocess, train_step = build_bench_train(
        cfg, compat=args.compat, k_steps=k_steps)

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
        batch_sds = {k: sds((k_steps,) + v.shape, v.dtype)
                     for k, v in batch_sds.items()}
    t0 = time.perf_counter()
    lowered = train_step.lower(state_sds, batch_sds, rng_sds)
    t1 = time.perf_counter()
    variant = (f"{'compat' if args.compat else 'flagship'}"
               f"{'+amp_attn_scores' if not args.compat and not args.no_amp_attn else ''}"
               f"{f'+K={k_steps}' if k_steps > 1 else ''}"
               f"{f'+slim7={args.slim_stage7}' if args.slim_stage7 else ''}"
               f"{'+trimmed' if args.trimmed else ''}")
    if args.lower_only:
        print(f"lowered in {t1 - t0:.1f}s", file=sys.stderr)
        print(f"{variant} hlo_sha256={stripped_hlo_hash(lowered)}")
        return
    print(f"lowered in {t1 - t0:.1f}s; compiling (remote service)...", file=sys.stderr)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    mem = getattr(compiled, "memory_analysis", lambda: None)()
    print(f"compiled in {t2 - t1:.1f}s; cache warmed for {variant}")
    if mem is not None:
        try:
            print(f"temp allocation: {mem.temp_size_in_bytes / 1e9:.2f} GB", file=sys.stderr)
        except Exception:
            pass


if __name__ == "__main__":
    main()
