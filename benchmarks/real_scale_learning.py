"""Real-scale learning evidence on the real TPU: B5-class pretraining at the
production resolution (912x1520) on structured synthetic image-text pairs.

The toy learning gate (tests/test_clip_learns.py) runs a b0 at 64x64 on the CPU
mesh; this experiment runs the ACTUAL bench recipes — the full B5-class dual
encoder at full resolution, the production train step (on-device augmentation,
multi-positive loss, AdamW + the bench schedule) — and shows each path learns a
transferable feature (zero-shot AUROC on held-out images) at real scale:

* ``--path compat``          reference-exact checkpoint-compatible path
* ``--path flagship``        the tpu_optimized flagship recipe — since the r4
                             demotion this IS what bench.py measures by
                             default; pass --slim-stage3 256 --slim-stage5 768
                             --slim-stage6 1536 --slim-stage4 512 to reproduce
                             the opt-in ``bench.py --trimmed`` variant (trims
                             demoted when the graded gate failed to fail the
                             over-cut control — BASELINE.md r4)
* ``--path flagship-warm``   flagship importance-warm-started from the compat
                             arm's trained weights (convert/flagship_init) —
                             quality evidence for the warm-start feature: the
                             seeded run must reach the AUROC bar in fewer steps
                             than from scratch.

The model/loss/optimizer/step construction is copied line-for-line from
bench.py so the TPU executables come out of the persistent compile cache
(a fresh B5 train-step compile costs 10-40 min on this pod's relay).

Synthetic tasks (``--task``):

* ``shapes`` (default, r4) — the GRADED task built after the r3 gate
  saturated (VERDICT r3 "what's weak" #1: AUROC=1.0 at every eval of every
  arm ranks nothing). Four fine-grained classes — no-finding, low-contrast
  square, disc (same bounding box as the square: the pair differs only in
  corners), and a two-bar grating — at four graded contrast amplitudes
  (+20/+35/+60/+90 over a 0-60 uniform background, i.e. ~1-5 sigma of the
  background noise), 96x96 patches at jittered positions in both views.
  Every image additionally carries three bright "calibration specks" so the
  per-image min-max normalization (ops/augment.minmax_standardize) cannot
  leak class through the global scale. Eval: macro one-vs-rest zero-shot
  AUROC over the 4 classes + top-1 accuracy per contrast bucket — a
  continuous bar that arms can RANK on, and that an over-cut model must
  visibly fail (the negative-control requirement).
* ``bright`` — the r3 task (binary high-contrast 200x200 bright square),
  kept verbatim so the r3 BASELINE numbers stay reproducible.

Batch composition reshuffles every epoch in both tasks (the BN-cheat guard
documented in BASELINE.md r3).

Prints one JSON line per eval: {"path", "step", "loss", "auroc", ...}.
Results are recorded in BASELINE.md (r3/r4 "real-scale learning" sections).
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time

import numpy as np

BATCH = 8
H, W = 1520, 912  # cfg order: image_size_h x image_size_w


def _enable_compile_cache():
    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()


# --- graded "shapes" task (r4) ---------------------------------------------------

SHAPE_TOKENS = (3001, 7001, 7002, 7003)  # no-finding, square, disc, bars
SHAPE_NAMES = ("none", "square", "disc", "bars")
SHAPE_AMPS = (20, 35, 60, 90)  # contrast over the 0-60 uniform background
PATCH = 96


def _shape_mask(cls: int) -> "np.ndarray":
    """Boolean PATCHxPATCH mask for class 1/2/3. Square and disc share the
    same bounding box so the pair differs only in the corners — the
    fine-grained end of the difficulty scale."""
    if cls == 1:  # filled square
        return np.ones((PATCH, PATCH), bool)
    if cls == 2:  # filled disc inscribed in the same box
        yy, xx = np.mgrid[0:PATCH, 0:PATCH]
        r = PATCH / 2.0
        return (yy - r + 0.5) ** 2 + (xx - r + 0.5) ** 2 <= r * r
    m = np.zeros((PATCH, PATCH), bool)  # two horizontal bars
    m[12:34, :] = True
    m[62:84, :] = True
    return m


def make_pairs_shapes(n, h, w, seq, vocab, seed):
    """Graded 4-class task: class- and amplitude-stratified samples; the class
    shape (if any) is drawn at an independent jittered position in BOTH views;
    every image gets 3 bright calibration specks so per-image min-max cannot
    encode class in the global scale. Returns (v1, v2, ids1, ids2, mask,
    cls[n], amp[n])."""
    rng = np.random.default_rng(seed)
    v1 = rng.integers(0, 60, (n, h, w, 1)).astype(np.uint8)
    v2 = rng.integers(0, 60, (n, h, w, 1)).astype(np.uint8)
    cls = (np.arange(n) % 4).astype(np.int64)
    amp = np.asarray([SHAPE_AMPS[(i // 4) % len(SHAPE_AMPS)] for i in range(n)],
                     np.int32)
    masks = {c: _shape_mask(c) for c in (1, 2, 3)}
    ids1 = np.zeros((n, seq), np.int32)
    ids2 = np.zeros((n, seq), np.int32)
    tmask = np.zeros((n, seq), np.int32)
    tmask[:, :8] = 1
    for i in range(n):
        for arr in (v1, v2):
            img = arr[i, :, :, 0]
            if cls[i]:
                y = int(rng.integers(h // 8, h - h // 8 - PATCH))
                x = int(rng.integers(w // 8, w - w // 8 - PATCH))
                m = masks[int(cls[i])]
                reg = img[y:y + PATCH, x:x + PATCH]
                reg[m] = np.minimum(reg[m].astype(np.int32) + int(amp[i]),
                                    255).astype(np.uint8)
            # specks AFTER the shape, values strictly above any patch pixel
            # (149 = 59+90 < 150): the per-image max always lands in the
            # speck range, so min-max normalization carries zero class signal
            for _ in range(3):
                sy = int(rng.integers(0, h - 6))
                sx = int(rng.integers(0, w - 6))
                img[sy:sy + 6, sx:sx + 6] = rng.integers(150, 161)
        tok = SHAPE_TOKENS[int(cls[i])]
        uniq = [10 + (i // 100) % 100, 120 + i % 100]
        ids1[i, :8] = [101 % vocab, tok, uniq[0], uniq[1], 500, 501, 502, 102 % vocab]
        ids2[i, :8] = [101 % vocab, tok, uniq[1], uniq[0], 600, 601, 602, 102 % vocab]
    return v1, v2, ids1, ids2, tmask, cls, amp


def make_pairs(n, h, w, seq, vocab, seed):
    """Structured pairs: positives get a bright square in BOTH views; two
    unique token 'reports' per sample sharing a class-keyword token."""
    rng = np.random.default_rng(seed)
    v1 = rng.integers(0, 60, (n, h, w, 1)).astype(np.uint8)
    v2 = rng.integers(0, 60, (n, h, w, 1)).astype(np.uint8)
    labels = (np.arange(n) % 2).astype(np.float32)
    pos_tok, neg_tok = 7001, 3001
    ids1 = np.zeros((n, seq), np.int32)
    ids2 = np.zeros((n, seq), np.int32)
    mask = np.zeros((n, seq), np.int32)
    mask[:, :8] = 1
    for i in range(n):
        if labels[i]:
            for arr in (v1, v2):
                y = int(rng.integers(h // 8, h // 2))
                x = int(rng.integers(w // 8, w // 2))
                arr[i, y:y + 200, x:x + 200] = 200 + (arr[i, y:y + 200, x:x + 200] // 4)
        cls = pos_tok if labels[i] else neg_tok
        uniq = [10 + (i // 100) % 100, 120 + i % 100]
        ids1[i, :8] = [101 % vocab, cls, uniq[0], uniq[1], 500, 501, 502, 102 % vocab]
        ids2[i, :8] = [101 % vocab, cls, uniq[1], uniq[0], 600, 601, 602, 102 % vocab]
    return v1, v2, ids1, ids2, mask, labels, (pos_tok, neg_tok)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", choices=["compat", "flagship", "flagship-warm"],
                    default="flagship")
    ap.add_argument("--task", choices=["shapes", "bright"], default="shapes",
                    help="'shapes' = the graded 4-class low-contrast task "
                    "(r4, non-saturating gate); 'bright' = the r3 binary "
                    "bright-square task (kept for reproducibility)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--train-n", type=int, default=384)
    ap.add_argument("--holdout-n", type=int, default=96)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--save-params", type=str, default="",
                    help="pickle the final variables here (for the warm arm)")
    ap.add_argument("--warm-from", type=str, default="",
                    help="pickle of compat variables to warm-start from")
    ap.add_argument("--lr-scale", type=float, default=1.0,
                    help="peak-LR multiplier (the optimizer.warm_start_lr_scale "
                    "production knob: the full-peak warm arm drifted upward "
                    "past convergence, BASELINE.md r3 observation 1)")
    ap.add_argument("--slim-stage3", type=int, default=0, metavar="E",
                    help="with a flagship path: tpu_slim_stage3 override "
                    "(256 is part of the promoted bench recipe, r3; 128 is "
                    "the r4 negative-control cut); 0 = off")
    ap.add_argument("--slim-stage5", type=int, default=0, metavar="E",
                    help="with a flagship path: tpu_slim_stage5 override; 0 = off")
    ap.add_argument("--slim-stage6", type=int, default=0, metavar="E",
                    help="with a flagship path: tpu_slim_stage6 override; 0 = off")
    ap.add_argument("--slim-stage4", type=int, default=0, metavar="E",
                    help="with a flagship path: tpu_slim_stage4 override; 0 = off")
    ap.add_argument("--slim-stage7", type=int, default=0, metavar="E",
                    help="with a flagship path: tpu_slim_stage7 override; 0 = off")
    ap.add_argument("--ckpt", type=str, default="",
                    help="periodically pickle the full train state here; a "
                    "wedged arm (this pod's relay occasionally blocks forever "
                    "on a fetch after 30-60 min, BASELINE.md r3) can then be "
                    "resumed with --resume instead of losing the run")
    ap.add_argument("--ckpt-every", type=int, default=500,
                    help="checkpoint interval in steps (state fetch through "
                    "the relay costs ~1-2 min, so keep this coarse)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --ckpt: restores params/batch_stats/"
                    "opt_state and fast-forwards the deterministic batch-"
                    "composition stream to the saved step")
    ap.add_argument("--seed", type=int, default=0,
                    help="replication seed (ADVICE r3: single-run promotion): "
                    "offsets the data/init/order/step streams together. Only "
                    "runtime values change, so a second-seed arm reuses the "
                    "compiled executable from the seed-0 arm")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    _enable_compile_cache()

    from mammo_clip_tpu.core.config import default_pretrain_config
    from mammo_clip_tpu.eval.metrics import auroc
    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.ops.augment import AugmentConfig, augment_two_views, minmax_standardize
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
        warmup_cosine_sq_schedule,
    )

    compat = args.path == "compat"
    path_label = args.path
    if args.task != "shapes":
        path_label += f"-{args.task}"
    if args.lr_scale != 1.0:
        path_label += f"-lr[{args.lr_scale}]"
    if args.slim_stage3:
        path_label += f"-slim3[{args.slim_stage3}]"
    if args.slim_stage5:
        path_label += f"-slim5[{args.slim_stage5}]"
    if args.slim_stage6:
        path_label += f"-slim6[{args.slim_stage6}]"
    if args.slim_stage4:
        path_label += f"-slim4[{args.slim_stage4}]"
    if args.slim_stage7:
        path_label += f"-slim7[{args.slim_stage7}]"
    if args.seed:
        path_label += f"-seed[{args.seed}]"
    cfg = default_pretrain_config("b5")
    cfg.model.image_encoder.remat = True
    if not compat:
        cfg.model.image_encoder.tpu_optimized = True
        cfg.model.image_encoder.remat = False
        cfg.model.image_encoder.tpu_slim_stage3 = args.slim_stage3
        cfg.model.image_encoder.tpu_slim_stage5 = args.slim_stage5
        cfg.model.image_encoder.tpu_slim_stage6 = args.slim_stage6
        cfg.model.image_encoder.tpu_slim_stage4 = args.slim_stage4
        cfg.model.image_encoder.tpu_slim_stage7 = args.slim_stage7
    elif (args.slim_stage3 or args.slim_stage5 or args.slim_stage6
          or args.slim_stage4 or args.slim_stage7):
        ap.error("--slim-stage* only applies to the flagship paths")
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    seq = cfg.data.text_max_length
    vocab = cfg.model.text_encoder.vocab_size

    model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)
    loss_fn = build_loss(cfg.loss.to_dict())
    schedule = warmup_cosine_sq_schedule(cfg.optimizer.lr * args.lr_scale,
                                         total_steps=10_000, warmup_steps=500)
    tx = build_optimizer(cfg.optimizer.to_dict(), schedule)

    aug = AugmentConfig.from_dict(cfg.augment.to_dict())
    mean, std = cfg.data.mean, cfg.data.std

    def preprocess(batch, rng):
        batch = dict(batch)
        batch["images"], batch["image_views"] = augment_two_views(
            batch["images"], batch["image_views"], rng, aug, mean, std, train=True,
            out_dtype=None if compat else jnp.bfloat16,
        )
        return batch

    print(f"[{args.path}] generating {args.train_n}+{args.holdout_n} structured "
          f"'{args.task}' pairs at {h}x{w}...", file=sys.stderr)
    if args.task == "shapes":
        v1, v2, ids1, ids2, mask, labels, _amps = make_pairs_shapes(
            args.train_n, h, w, seq, vocab, seed=0 + 100 * args.seed)
        hv1, _, _, _, _, hlabels, hamps = make_pairs_shapes(
            args.holdout_n, h, w, seq, vocab, seed=9 + 100 * args.seed)
    else:
        v1, v2, ids1, ids2, mask, labels, (pos_tok, neg_tok) = make_pairs(
            args.train_n, h, w, seq, vocab, seed=0 + 100 * args.seed)
        hv1, _, _, _, _, hlabels, _ = make_pairs(
            args.holdout_n, h, w, seq, vocab, seed=9 + 100 * args.seed)

    init_example = {
        "images": jnp.zeros((BATCH, h, w, 1), jnp.float32),
        "image_views": jnp.zeros((BATCH, h, w, 1), jnp.float32),
        "input_ids": jnp.ones((BATCH, seq), jnp.int32),
        "attention_mask": jnp.ones((BATCH, seq), jnp.int32),
        "input_ids2": jnp.ones((BATCH, seq), jnp.int32),
        "attention_mask2": jnp.ones((BATCH, seq), jnp.int32),
    }
    state = create_train_state(model, init_example, tx,
                               jax.random.PRNGKey(args.seed))

    if args.warm_from:
        from mammo_clip_tpu.convert.flagship_init import flagship_warm_start

        with open(args.warm_from, "rb") as f:
            src_vars = pickle.load(f)
        seeded = flagship_warm_start(
            src_vars, {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, seeded["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, seeded["batch_stats"]))
        print(f"[{args.path}] warm-started from {args.warm_from}", file=sys.stderr)

    train_step = make_train_step(model, loss_fn, preprocess=preprocess, donate=True)

    # serving-path eval fns: identical construction to benchmarks/bench_infer.py
    # (cache hit at batch 32) — built WITHOUT the remat flag, like bench_infer,
    # so the eval executables come out of its cache (remat changes the eval HLO
    # but not the param tree, so the train arrays drop straight in)
    eval_cfg = default_pretrain_config("b5")
    if not compat:
        eval_cfg.model.image_encoder.tpu_optimized = True
        # slim overrides change the param tree, so the eval model must carry
        # them too (those arms forgo the bench_infer cache hit)
        eval_cfg.model.image_encoder.tpu_slim_stage3 = args.slim_stage3
        eval_cfg.model.image_encoder.tpu_slim_stage5 = args.slim_stage5
        eval_cfg.model.image_encoder.tpu_slim_stage6 = args.slim_stage6
        eval_cfg.model.image_encoder.tpu_slim_stage4 = args.slim_stage4
        eval_cfg.model.image_encoder.tpu_slim_stage7 = args.slim_stage7
    eval_model = build_model(eval_cfg.model.to_dict(), dtype=jnp.bfloat16)

    @jax.jit
    def embed_image(v, raw):
        x = minmax_standardize(raw, mean, std)
        return eval_model.apply(v, x, train=False, method=eval_model.embed_image)

    @jax.jit
    def embed_text(v, ids, m):
        return eval_model.apply(v, ids, m, train=False, method=eval_model.embed_text)

    prompts = np.zeros((32, seq), np.int32)
    pmask = np.zeros((32, seq), np.int32)
    if args.task == "shapes":
        n_cls = len(SHAPE_TOKENS)
        for c, tok in enumerate(SHAPE_TOKENS):
            prompts[c, :4] = [101 % vocab, tok, 500, 102 % vocab]
        pmask[:n_cls, :4] = 1
        pmask[n_cls:, 0] = 1  # pad rows still need one attended token
    else:
        prompts[0, :4] = [101 % vocab, pos_tok, 500, 102 % vocab]
        prompts[1, :4] = [101 % vocab, neg_tok, 500, 102 % vocab]
        pmask[:2, :4] = 1
        pmask[2:, 0] = 1

    def _holdout_embeddings(st):
        v = {"params": st.params, "batch_stats": st.batch_stats}
        embs = []
        for i in range(0, args.holdout_n, 32):
            e = embed_image(v, jnp.asarray(hv1[i:i + 32]))
            embs.append(np.asarray(e, np.float32))
        img = np.concatenate(embs)
        txt = np.asarray(embed_text(v, jnp.asarray(prompts), jnp.asarray(pmask)),
                         np.float32)
        return img, txt

    def zs_eval(st) -> dict:
        img, txt = _holdout_embeddings(st)
        if args.task != "shapes":
            score = img @ txt[0] - img @ txt[1]
            return {"auroc": round(auroc(hlabels, score), 4)}
        # macro one-vs-rest AUROC over the 4 classes (score_c contrasted
        # against the mean of the other class prompts), top-1 accuracy, and
        # accuracy per contrast bucket (classes 1-3) — the graded instrument
        scores = img @ txt[:n_cls].T  # (N, 4)
        contrast = scores - (scores.sum(1, keepdims=True) - scores) / (n_cls - 1)
        per_cls = [round(auroc(hlabels == c, contrast[:, c]), 4)
                   for c in range(n_cls)]
        pred = scores.argmax(1)
        acc = float((pred == hlabels).mean())
        acc_amp = {}
        for a in SHAPE_AMPS:
            sel = (hamps == a) & (hlabels > 0)
            # empty bucket (tiny --holdout-n) -> null, not NaN: json.dumps
            # would emit literal NaN, which strict JSON parsers reject
            acc_amp[str(a)] = (round(float((pred[sel] == hlabels[sel]).mean()), 4)
                               if sel.any() else None)
        return {"auroc": round(float(np.mean(per_cls)), 4),
                "auroc_cls": per_cls, "acc": round(acc, 4), "acc_amp": acc_amp}

    order_rng = np.random.default_rng(7 + 100 * args.seed)
    n, spe = args.train_n, args.train_n // BATCH
    step_rng = jax.random.PRNGKey(1 + 1000 * args.seed)
    t0 = time.time()
    loss_val = float("nan")

    start_step = 0
    order = None
    if args.resume:
        with open(args.ckpt, "rb") as f:
            saved = pickle.load(f)
        state = state.replace(
            step=jnp.asarray(saved["step"], jnp.int32),
            params=jax.tree_util.tree_map(jnp.asarray, saved["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, saved["batch_stats"]),
            opt_state=jax.tree_util.tree_map(jnp.asarray, saved["opt_state"]),
        )
        start_step = int(saved["step"])
        # fast-forward the deterministic batch-composition stream: replay the
        # per-epoch permutation draws up to (and including) the current epoch
        for _ in range(start_step // spe + (1 if start_step % spe else 0)):
            order = order_rng.permutation(n)
        print(f"[{path_label}] resumed at step {start_step} from {args.ckpt}",
              file=sys.stderr)

    def _save_ckpt(st, step_done):
        tmp = args.ckpt + ".tmp"
        payload = {
            "step": step_done,
            "params": jax.tree_util.tree_map(np.asarray, st.params),
            "batch_stats": jax.tree_util.tree_map(np.asarray, st.batch_stats),
            "opt_state": jax.tree_util.tree_map(np.asarray, st.opt_state),
        }
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        import os as _os
        _os.replace(tmp, args.ckpt)
        print(f"[{path_label}] checkpointed step {step_done} -> {args.ckpt}",
              file=sys.stderr)

    for step in range(start_step, args.steps):
        k = step % spe
        if k == 0:
            order = order_rng.permutation(n)
        sel = order[k * BATCH:(k + 1) * BATCH]
        batch = {
            "images": jnp.asarray(v1[sel]),
            "image_views": jnp.asarray(v2[sel]),
            "input_ids": jnp.asarray(ids1[sel]),
            "attention_mask": jnp.asarray(mask[sel]),
            "input_ids2": jnp.asarray(ids2[sel]),
            "attention_mask2": jnp.asarray(mask[sel]),
        }
        state, loss_dict = train_step(state, batch, step_rng)
        if (step + 1) % 5 == 0:
            loss_val = float(loss_dict["total"])  # sync fetch (relay acks early)
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            rec = {"path": path_label, "step": step + 1,
                   "loss": round(loss_val, 4)}
            rec.update(zs_eval(state))
            rec["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps(rec))
            sys.stdout.flush()
        if args.ckpt and (step + 1) % args.ckpt_every == 0 and step + 1 < args.steps:
            _save_ckpt(state, step + 1)

    if args.save_params:
        v = {"params": jax.tree_util.tree_map(np.asarray, state.params),
             "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats)}
        with open(args.save_params, "wb") as f:
            pickle.dump(v, f)
        print(f"[{args.path}] saved variables to {args.save_params}", file=sys.stderr)


if __name__ == "__main__":
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
