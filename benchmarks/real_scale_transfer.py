"""Downstream TRANSFER parity at real scale: linear probes on the frozen
encoders trained by benchmarks/real_scale_learning.py arms.

The real-scale arms (r4/r5) measure ZERO-SHOT quality — prompt matching in the
shared embedding space. This probe measures the other thing a Mammo-CLIP user
actually does with the checkpoint: freeze the encoder and fit a linear readout
(the reference's linear-probe protocol — `train_classifier.py` with
``model.freeze_backbone: True``, README.md "Evaluation: Linear Probe"). If the
TPU-native flagship recipe were quietly trading representation quality for
throughput, a supervised readout could expose structure the 4 fixed class
prompts cannot: the probe sees PROBE-TRAIN fresh images (disjoint seeds from
both the arm's pretraining set and its zero-shot holdout) and is scored on a
second disjoint set.

Protocol per arm checkpoint (a pickle written by real_scale_learning --ckpt):

1. rebuild the arm's model (same --path/--slim flags), load params+batch_stats;
2. extract frozen features for N probe-train + M probe-eval images drawn fresh
   from the same graded 4-class task family (make_pairs_shapes);
   ``--features embed``  = projected L2-normalized CLIP embeddings (512-d) —
                           reuses the arms' cached embed_image executable;
   ``--features pooled`` = encoder pooled features (2048-d), the reference lp
                           protocol's input (breastclip encode_image) — costs
                           one fresh forward-only compile on this pod's relay;
3. fit multinomial logistic regression (sklearn, lbfgs) on the train features —
   the same "single linear layer on a frozen encoder" readout the reference
   trains with torch (`MammoClassification` with frozen backbone);
4. report macro one-vs-rest AUROC over the 4 classes + top-1 accuracy per
   contrast-amplitude bucket on the eval set — the same instrument as the
   arms' zero-shot gate, so the two evidence types are directly comparable.

Prints one JSON line. Results recorded in BASELINE.md (r5).
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time

import numpy as np

try:  # run as a script (sys.path[0] = benchmarks/) or imported as a package
    from real_scale_learning import (
        SHAPE_AMPS,
        SHAPE_TOKENS,
        _enable_compile_cache,
        make_pairs_shapes,
    )
except ImportError:
    from benchmarks.real_scale_learning import (
        SHAPE_AMPS,
        SHAPE_TOKENS,
        _enable_compile_cache,
        make_pairs_shapes,
    )


def probe_metrics(prob: "np.ndarray", labels: "np.ndarray",
                  amps: "np.ndarray") -> dict:
    """Same instrument as the arms' zero-shot gate: macro one-vs-rest AUROC,
    top-1 accuracy, accuracy per contrast-amplitude bucket (classes 1-3)."""
    from mammo_clip_tpu.eval.metrics import auroc

    n_cls = prob.shape[1]
    per_cls = [round(auroc(labels == c, prob[:, c]), 4) for c in range(n_cls)]
    pred = prob.argmax(1)
    acc_amp = {}
    for a in SHAPE_AMPS:
        sel = (amps == a) & (labels > 0)
        acc_amp[str(a)] = (round(float((pred[sel] == labels[sel]).mean()), 4)
                           if sel.any() else None)
    return {"macro_auroc": round(float(np.mean(per_cls)), 4),
            "auroc_cls": per_cls,
            "acc": round(float((pred == labels).mean()), 4),
            "acc_amp": acc_amp}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="pickle written by real_scale_learning --ckpt")
    ap.add_argument("--path", choices=["compat", "flagship"], default="flagship",
                    help="which arm produced the checkpoint (rebuilds the "
                    "matching model)")
    ap.add_argument("--features", choices=["embed", "pooled"], default="embed")
    ap.add_argument("--slim-stage3", type=int, default=0)
    ap.add_argument("--slim-stage5", type=int, default=0)
    ap.add_argument("--slim-stage6", type=int, default=0)
    ap.add_argument("--slim-stage4", type=int, default=0)
    ap.add_argument("--slim-stage7", type=int, default=0)
    ap.add_argument("--probe-train-n", type=int, default=512)
    ap.add_argument("--probe-eval-n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0,
                    help="offsets the probe data streams; keep equal to the "
                    "arm's --seed so arms of one comparison see identical "
                    "probe data")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    _enable_compile_cache()

    from mammo_clip_tpu.core.config import default_pretrain_config
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.ops.augment import minmax_standardize

    cfg = default_pretrain_config("b5")
    if args.path == "flagship":
        cfg.model.image_encoder.tpu_optimized = True
        cfg.model.image_encoder.tpu_slim_stage3 = args.slim_stage3
        cfg.model.image_encoder.tpu_slim_stage5 = args.slim_stage5
        cfg.model.image_encoder.tpu_slim_stage6 = args.slim_stage6
        cfg.model.image_encoder.tpu_slim_stage4 = args.slim_stage4
        cfg.model.image_encoder.tpu_slim_stage7 = args.slim_stage7
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
    # --ckpt pickles carry "step"; --save-params endpoint pickles don't (-1)
    ckpt_step = int(saved.get("step", -1))
    label = f"{args.path}-probe[{args.features}]-seed[{args.seed}]"
    print(f"[{label}] loaded step-{ckpt_step} checkpoint {args.ckpt}",
          file=sys.stderr)

    method = model.embed_image if args.features == "embed" else model.encode_image

    @jax.jit
    def extract(v, raw):
        x = minmax_standardize(raw, mean, std)
        return model.apply(v, x, train=False, method=method)

    # probe data: seed families disjoint from the arms' pretrain (0+100*seed)
    # and zero-shot holdout (9+100*seed) streams
    print(f"[{label}] generating {args.probe_train_n}+{args.probe_eval_n} "
          f"probe images at {h}x{w}...", file=sys.stderr)
    tv, _, _, _, _, tlabels, tamps = make_pairs_shapes(
        args.probe_train_n, h, w, seq, vocab, seed=1300 + 100 * args.seed)
    ev, _, _, _, _, elabels, eamps = make_pairs_shapes(
        args.probe_eval_n, h, w, seq, vocab, seed=1900 + 100 * args.seed)

    def features(imgs):
        out = []
        t0 = time.time()
        for i in range(0, len(imgs), 32):
            chunk = imgs[i:i + 32]
            pad = 32 - len(chunk)  # static batch 32: keep ONE executable
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, h, w, 1), np.uint8)])
            e = np.asarray(extract(variables, jnp.asarray(chunk)), np.float32)
            out.append(e[:32 - pad])
        print(f"[{label}] {len(imgs)} features in {time.time() - t0:.1f}s",
              file=sys.stderr)
        return np.concatenate(out)

    ftr = features(tv)
    fev = features(ev)

    # with embed features the eval matrix IS the zero-shot image embedding:
    # score the arms' 4 class prompts on this independent eval set too — an
    # endpoint replication at a fresh seed family with SE ~1/sqrt(n_eval)
    # tighter than the arms' 128-image holdout (BASELINE r4 noise floor)
    zs = None
    if args.features == "embed":
        @jax.jit
        def embed_text(v, ids, m):
            return model.apply(v, ids, m, train=False, method=model.embed_text)

        prompts = np.zeros((32, seq), np.int32)
        pmask = np.zeros((32, seq), np.int32)
        n_cls = len(SHAPE_TOKENS)
        for c, tok in enumerate(SHAPE_TOKENS):
            prompts[c, :4] = [101 % vocab, tok, 500, 102 % vocab]
        pmask[:n_cls, :4] = 1
        pmask[n_cls:, 0] = 1
        txt = np.asarray(embed_text(variables, jnp.asarray(prompts),
                                    jnp.asarray(pmask)), np.float32)
        scores = fev @ txt[:n_cls].T
        # same contrast as the arms' zs_eval; argmax-invariant (row-constant
        # shift), so probe_metrics' acc equals the arms' argmax(scores) acc
        contrast = scores - (scores.sum(1, keepdims=True) - scores) / (n_cls - 1)
        zs = {("zs_" + k): v for k, v in
              probe_metrics(contrast, elabels, eamps).items()}

    # z-score from probe-train stats (pooled features are unnormalized)
    mu, sd = ftr.mean(0), ftr.std(0) + 1e-6
    ftr = (ftr - mu) / sd
    fev = (fev - mu) / sd

    from sklearn.linear_model import LogisticRegression

    probe = LogisticRegression(max_iter=2000, C=1.0)
    probe.fit(ftr, tlabels)
    prob = probe.predict_proba(fev)

    out = {"probe": label, "ckpt": args.ckpt, "ckpt_step": ckpt_step,
           "features": args.features, "n_train": args.probe_train_n,
           "n_eval": args.probe_eval_n,
           "train_acc": round(float(probe.score(ftr, tlabels)), 4)}
    out.update(probe_metrics(prob, elabels, eamps))
    if zs is not None:
        out.update(zs)
    print(json.dumps(out))


if __name__ == "__main__":
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
