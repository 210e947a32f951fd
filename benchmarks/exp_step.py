"""Parametrized pretrain-step experiment runner (real TPU).

Explores the memory/throughput space that bench.py reports one point of:
batch size, remat policy, packed remat residuals. Prints a JSON line with the
per-step time and (when available) the compiled memory analysis.

Usage: python benchmarks/exp_step.py --batch 12 --remat full [--packed] [--compile-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", choices=["off", "selective", "full"], default="selective")
    ap.add_argument("--packed", action="store_true", help="pack remat residuals (lane-compact)")
    ap.add_argument("--bert-remat", action="store_true", help="rematerialize BERT layers")
    ap.add_argument("--fused-mbconv", action="store_true",
                    help="fused Pallas MBConv for the qualifying early-stage blocks")
    ap.add_argument("--tpu-opt", action="store_true",
                    help="tpu_optimized encoder variant (space-to-depth front end)")
    ap.add_argument("--front-blocks", type=int, default=None,
                    help="with --tpu-opt: front-end MBConv block count")
    ap.add_argument("--front-expand", type=int, default=None,
                    help="with --tpu-opt: front-end expand_ratio")
    ap.add_argument("--int8", action="store_true",
                    help="int8 MXU matmuls for the k5 stages' 1x1 convs")
    ap.add_argument("--flat-opt", action="store_true",
                    help="optax.flatten the optimizer (one fused update chain "
                    "instead of ~600 per-leaf ops)")
    ap.add_argument("--flat-small", type=int, default=None, metavar="BYTES",
                    help="bucketed optimizer fusion: fuse leaves <= BYTES into "
                    "one flat update vector, keep big conv kernels per-leaf")
    ap.add_argument("--slim-stage3", type=int, default=None, metavar="E",
                    help="with --tpu-opt: expanded-width override for the "
                    "E=384 k5 stage (capacity-cut probe, ROADMAP #2)")
    ap.add_argument("--slim-stage6", type=int, default=None, metavar="E",
                    help="tpu_slim_stage6 override (E=1792 k5 blocks)")
    ap.add_argument("--slim-stage4", type=int, default=None, metavar="E",
                    help="tpu_slim_stage4 override (E=768 k3 in-stage blocks)")
    ap.add_argument("--slim-stage7", type=int, default=None, metavar="E",
                    help="tpu_slim_stage7 override (E=3072 k3 blocks)")
    ap.add_argument("--slim-stage5", type=int, default=None, metavar="E",
                    help="with --tpu-opt: expanded-width override for the "
                    "E=1024 k5 stage (B5 stage5 in-stage blocks; the next "
                    "capacity-cut candidate, ROADMAP r3 #3)")
    ap.add_argument("--fused-qkv", action="store_true",
                    help="BERT Q/K/V as one (H,3H) MXU matmul (param tree "
                    "unchanged; BASELINE r3 BERT-MFU item)")
    ap.add_argument("--no-dense-widths", action="store_true",
                    help="with --tpu-opt: keep the r2 deep-stage widths "
                    "(reproduces the round-2 flagship exactly)")
    ap.add_argument("--remat-max", type=int, default=None,
                    help="override remat_max_reduction (selective remat scale "
                    "cutoff; probe for the compat-path recompute-traffic study)")
    ap.add_argument("--s2d", action="store_true",
                    help="exact space-to-depth EXECUTION of the standard encoder "
                    "(same function/params, 4x lane-denser early stages)")
    ap.add_argument("--xla-opt", action="append", default=[], metavar="K=V",
                    help="TPU compiler option passed to lowered.compile() "
                    "(e.g. xla_tpu_scoped_vmem_limit_kib=65536); the local "
                    "CPU-only client rejects TPU flags in XLA_FLAGS, so this "
                    "is the only way to reach the remote compile service")
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--group", type=int, default=5)
    args = ap.parse_args()

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

    cfg = default_pretrain_config("b5")
    cfg.model.image_encoder.remat = args.remat != "off"
    if args.remat == "full":
        cfg.model.image_encoder.remat_max_reduction = 32
    if args.packed:
        cfg.model.image_encoder.packed_residuals = True
    if args.bert_remat:
        cfg.model.text_encoder.gradient_checkpointing = True
    if args.fused_mbconv:
        cfg.model.image_encoder.fused_mbconv = True
    if args.tpu_opt:
        cfg.model.image_encoder.tpu_optimized = True
        if args.no_dense_widths:
            cfg.model.image_encoder.tpu_dense_widths = False
        if args.front_blocks is not None:
            cfg.model.image_encoder.tpu_front_blocks = args.front_blocks
        if args.front_expand is not None:
            cfg.model.image_encoder.tpu_front_expand = args.front_expand
    if args.s2d:
        cfg.model.image_encoder.s2d_exec = True
    if args.remat_max is not None:
        cfg.model.image_encoder.remat_max_reduction = args.remat_max
    if args.int8:
        cfg.model.image_encoder.quant_int8_k5 = True
    if args.flat_opt:
        cfg.optimizer.flatten = True
    if args.flat_small is not None:
        cfg.optimizer.flatten_small_bytes = args.flat_small
    if args.fused_qkv:
        cfg.model.text_encoder.fused_qkv = True
    if args.slim_stage3 is not None:
        cfg.model.image_encoder.tpu_slim_stage3 = args.slim_stage3
    if args.slim_stage5 is not None:
        cfg.model.image_encoder.tpu_slim_stage5 = args.slim_stage5
    if args.slim_stage6 is not None:
        cfg.model.image_encoder.tpu_slim_stage6 = args.slim_stage6
    if args.slim_stage4 is not None:
        cfg.model.image_encoder.tpu_slim_stage4 = args.slim_stage4
    if args.slim_stage7 is not None:
        cfg.model.image_encoder.tpu_slim_stage7 = args.slim_stage7
    B = args.batch
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
            out_dtype=jnp.bfloat16 if args.tpu_opt else None,  # flagship recipe
        )
        return batch

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.model.text_encoder.vocab_size, size=(B, seq), dtype=np.int32)
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, size=(B, h, w, 1), dtype=np.uint8)),
        "image_views": jnp.asarray(rng.integers(0, 255, size=(B, h, w, 1), dtype=np.uint8)),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, seq), jnp.int32),
        "input_ids2": jnp.asarray(ids),
        "attention_mask2": jnp.ones((B, seq), jnp.int32),
    }
    init_example = dict(batch)
    init_example["images"] = jnp.zeros((B, h, w, 1), jnp.float32)
    init_example["image_views"] = jnp.zeros((B, h, w, 1), jnp.float32)
    state = create_train_state(model, init_example, tx, jax.random.PRNGKey(0))
    train_step = make_train_step(model, loss_fn, preprocess=preprocess, donate=True)

    t0 = time.perf_counter()
    lowered = train_step.lower(state, batch, jax.random.PRNGKey(1))
    copts = dict(kv.split("=", 1) for kv in args.xla_opt)
    compiled = lowered.compile(compiler_options=copts) if copts else lowered.compile()
    compile_s = time.perf_counter() - t0
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "peak_extra_gb": round(
                (ma.temp_size_in_bytes + ma.output_size_in_bytes) / 2**30, 3
            ),
        }
    except Exception as e:  # memory_analysis availability varies per backend
        mem = {"memory_analysis_error": str(e)}

    out = {
        "batch": B,
        "remat": args.remat,
        "packed": args.packed,
        "s2d": args.s2d,
        "tpu_opt": args.tpu_opt,
        "compile_s": round(compile_s, 1),
        **mem,
    }
    if not args.compile_only:
        # run the AOT executable (NOT the jit fn): it is the one carrying any
        # --xla-opt compiler options
        step_rng = jax.random.PRNGKey(1)
        for _ in range(3):
            state, loss_dict = compiled(state, batch, step_rng)
            warm = float(loss_dict["total"])
        assert np.isfinite(warm), f"non-finite loss {warm}"
        times = []
        for _ in range(max(1, args.steps // args.group)):
            t0 = time.perf_counter()
            for _ in range(args.group):
                state, loss_dict = compiled(state, batch, step_rng)
            _ = float(loss_dict["total"])
            times.append((time.perf_counter() - t0) / args.group)
        median = sorted(times)[len(times) // 2]
        out["per_step_ms"] = round(median * 1e3, 1)
        out["images_per_sec"] = round(2 * B / median, 2)
        print(f"groups: {[round(t * 1e3, 1) for t in times]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
