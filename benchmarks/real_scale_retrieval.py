"""Image->text retrieval at real scale on the arm endpoints — the FOURTH
independent quality readout (after zero-shot prompts, linear probes, and
detection transfer), exercising the production retrieval evaluator
(eval/retrieval.eval_image_text_retrieval, reference evaluator.py:197-252)
on the real chip.

Protocol: N fresh graded-task pairs (seed family disjoint from pretrain /
holdout / probe streams); embed the view-1 images and their report-1 token
rows with the endpoint weights (both executables cached from the arms);
each report is sample-unique (class token + two per-sample unique tokens),
so Recall@K measures whether the encoder pair preserved the SAMPLE-level
correspondence the contrastive loss trained — strictly harder than the
4-class zero-shot readout (chance R@1 = 1/N).

Prints one JSON line. Results recorded in BASELINE.md (r5).
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys

import numpy as np

try:  # run as a script (sys.path[0] = benchmarks/) or imported as a package
    from real_scale_learning import _enable_compile_cache, make_pairs_shapes
except ImportError:
    from benchmarks.real_scale_learning import _enable_compile_cache, make_pairs_shapes


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="endpoint pickle (real_scale_learning --save-params)")
    ap.add_argument("--path", choices=["compat", "flagship"], default="flagship")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    _enable_compile_cache()

    from mammo_clip_tpu.core.config import default_pretrain_config
    from mammo_clip_tpu.eval.retrieval import eval_image_text_retrieval
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.ops.augment import minmax_standardize

    cfg = default_pretrain_config("b5")
    if args.path == "flagship":
        cfg.model.image_encoder.tpu_optimized = True
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    seq = cfg.data.text_max_length
    vocab = cfg.model.text_encoder.vocab_size
    mean, std = cfg.data.mean, cfg.data.std
    model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)

    with open(args.ckpt, "rb") as f:
        saved = pickle.load(f)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, saved["params"]),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, saved["batch_stats"]),
    }
    label = f"{args.path}-retrieval-seed[{args.seed}]"

    @jax.jit
    def embed_image(v, raw):
        x = minmax_standardize(raw, mean, std)
        return model.apply(v, x, train=False, method=model.embed_image)

    @jax.jit
    def embed_text(v, ids, m):
        return model.apply(v, ids, m, train=False, method=model.embed_text)

    print(f"[{label}] generating {args.n} pairs at {h}x{w}...", file=sys.stderr)
    v1, _, ids1, _, mask, _, _ = make_pairs_shapes(
        args.n, h, w, seq, vocab, seed=2500 + 100 * args.seed)

    img_e, txt_e = [], []
    for i in range(0, args.n, 32):
        img_e.append(np.asarray(embed_image(variables, jnp.asarray(v1[i:i + 32])),
                                np.float32))
        txt_e.append(np.asarray(embed_text(variables, jnp.asarray(ids1[i:i + 32]),
                                           jnp.asarray(mask[i:i + 32])), np.float32))
    img_e = np.concatenate(img_e)
    txt_e = np.concatenate(txt_e)
    texts = [" ".join(map(str, row[row > 0])) for row in ids1]  # sample-unique

    res = eval_image_text_retrieval(img_e, txt_e, texts)["retrieval_i2t"]
    out = {"arm": label, "ckpt": args.ckpt, "n": args.n,
           "chance_r1": round(1.0 / args.n, 4)}
    out.update({k: round(v, 4) for k, v in res.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
