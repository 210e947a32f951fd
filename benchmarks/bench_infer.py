"""Serving-path benchmark: embed-image / embed-text throughput on real TPU.

The reference's production story is embedding extraction + zero-shot scoring
(its README tutorials drive `get_embeddings`); this measures that path's
throughput for the framework's eval mode — B5 image tower @ 912x1520 and
BERT-base text @ 256 tokens, bf16 activations, batch-swept.

Also measures the int8 MXU path (`quant_int8_k5`) in EVAL mode: the training
step is HBM-bound and int8 measured NEGATIVE there (BASELINE.md r3), but
inference has no backward, no BN batch statistics, and larger arithmetic
intensity — the int8 question deserves its own number on the serving path.

Usage: python benchmarks/bench_infer.py [--compat] [--int8] [--batch N]
Prints one JSON line per configuration.
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
    ap.add_argument("--compat", action="store_true",
                    help="reference-exact encoder instead of the flagship")
    ap.add_argument("--int8", action="store_true",
                    help="int8 MXU matmuls for the k5 stages' 1x1 convs")
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = sweep 8/16/32")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from mammo_clip_tpu.core.config import default_pretrain_config
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.ops.augment import minmax_standardize

    cfg = default_pretrain_config("b5")
    if not args.compat:
        cfg.model.image_encoder.tpu_optimized = True
        # r4: torch-AMP attention-score storage — -20% on the text tower when
        # it runs ALONE (exactly this workload; BASELINE.md r4 amp probe),
        # equivalence-tested vs the fp32 path. Part of the flagship recipe.
        cfg.model.text_encoder.amp_attn_scores = True
    if args.int8:
        cfg.model.image_encoder.quant_int8_k5 = True
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    seq = cfg.data.text_max_length
    mean, std = cfg.data.mean, cfg.data.std

    model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)
    r = np.random.default_rng(0)

    batches = (args.batch,) if args.batch else (8, 16, 32)
    init_imgs = jnp.zeros((batches[0], h, w, 1), jnp.float32)
    ids0 = jnp.ones((batches[0], seq), jnp.int32)
    variables = jax.jit(lambda rng: model.init(
        rng, {"images": init_imgs, "input_ids": ids0, "attention_mask": ids0},
        train=False))({"params": jax.random.PRNGKey(0)})
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    @jax.jit
    def embed_image(v, raw):
        x = minmax_standardize(raw, mean, std)
        return model.apply(v, x, train=False, method=model.embed_image)

    @jax.jit
    def embed_text(v, ids, mask):
        return model.apply(v, ids, mask, train=False, method=model.embed_text)

    name = ("compat" if args.compat else "flagship") + ("+int8" if args.int8 else "")
    for B in batches:
        raw = jnp.asarray(r.integers(0, 255, (B, h, w, 1), dtype=np.uint8))
        e = embed_image(variables, raw)
        _ = float(jnp.sum(e))  # sync (relay acks block_until_ready early)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                e = embed_image(variables, raw)
            _ = float(jnp.sum(e))
            times.append((time.perf_counter() - t0) / args.steps)
        ms = sorted(times)[1] * 1e3
        print(json.dumps({"path": name, "op": "embed_image", "batch": B,
                          "ms_per_batch": round(ms, 2),
                          "images_per_sec": round(B / (ms / 1e3), 1)}))

    B = batches[-1]
    ids = jnp.asarray(r.integers(1, cfg.model.text_encoder.vocab_size,
                                 (B, seq), dtype=np.int32))
    mask = jnp.ones((B, seq), jnp.int32)
    e = embed_text(variables, ids, mask)
    _ = float(jnp.sum(e))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            e = embed_text(variables, ids, mask)
        _ = float(jnp.sum(e))
        times.append((time.perf_counter() - t0) / args.steps)
    ms = sorted(times)[1] * 1e3
    print(json.dumps({"path": name, "op": "embed_text", "batch": B,
                      "ms_per_batch": round(ms, 2),
                      "texts_per_sec": round(B / (ms / 1e3), 1)}))


if __name__ == "__main__":
    main()
