"""Real-scale detection TRANSFER on the real TPU: RetinaNet over the B5(-class)
backbone at the reference's production detection resolution (512x512,
`train_detector.py --resize 512`), with the backbone warm-started from a
real-scale pretraining arm's endpoint.

This mirrors the reference's headline downstream claim — a Mammo-CLIP
checkpoint improves VinDr detection over training from scratch
(`/root/reference/README.md` detector table; checkpoint ingestion
`Detectors/retinanet/efficientnet_utils.py:393-412`) — on the synthetic graded
task family this pod can pose. The detection targets are the SAME shapes the
pretraining arms learned to discriminate (square / disc / two-bar grating at
graded contrast amplitudes, 96x96 patches), so a pretrained backbone should
localize them faster than a random one if — and only if — the pretrained
features transfer through the detector's FPN taps.

Arms (``--init``):

* ``random``    randomly initialized backbone — the from-scratch control
* ``flagship``  backbone params+BN stats from the flagship arm's endpoint
                pickle (real_scale_learning --save-params)
* ``compat``    same, from the reference-exact compat arm

The train step is constructed EXACTLY like benchmarks/bench_downstream.py's
detector bench (same model config / 11-class head / anchors / default
AugmentConfig / adam+grad-clip / bs8 / (16,5) padded annotations) so the TPU
executable comes out of the r3 persistent compile cache for both the flagship
and compat backbone variants. Only 3 of the 11 classes ever appear in the
synthetic data; evaluate_map averages over present classes (absent classes are
skipped, downstream/detect.py:68).

Prints one JSON line per eval: {"arm", "step", "mAP", "ap_cls", ...}.
Results recorded in BASELINE.md (r5).
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time

import numpy as np

try:  # run as a script (sys.path[0] = benchmarks/) or imported as a package
    from real_scale_learning import SHAPE_AMPS, _enable_compile_cache, _shape_mask
except ImportError:
    from benchmarks.real_scale_learning import (
        SHAPE_AMPS,
        _enable_compile_cache,
        _shape_mask,
    )

B = 8
H = W = 512
PATCH = 96
MAX_BOXES = 16  # bench_downstream's annotation pad — keep the HLO identical
MEAN, STD = 0.3089279, 0.2505356  # bench_downstream.py:66


def make_detection_set(n, seed):
    """n images of 0-60 noise with 1-2 graded-contrast shapes at jittered
    positions + 3 calibration specks; returns (images uint8 (n,H,W,1),
    annotations (n,MAX_BOXES,5) with [x1,y1,x2,y2,cls], -1-padded)."""
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 60, (n, H, W, 1)).astype(np.uint8)
    anns = -np.ones((n, MAX_BOXES, 5), np.float32)
    masks = {c: _shape_mask(c) for c in (1, 2, 3)}
    for i in range(n):
        img = imgs[i, :, :, 0]
        n_shapes = 1 + int(rng.integers(0, 2))
        for s in range(n_shapes):
            cls = int(rng.integers(1, 4))
            amp = int(SHAPE_AMPS[int(rng.integers(0, len(SHAPE_AMPS)))])
            # keep the two shapes in disjoint halves so boxes never overlap
            lo = (H // 2) * s if n_shapes == 2 else 0
            hi = lo + (H // 2 if n_shapes == 2 else H)
            y = int(rng.integers(lo + 8, hi - PATCH - 8))
            x = int(rng.integers(8, W - PATCH - 8))
            m = masks[cls]
            reg = img[y:y + PATCH, x:x + PATCH]
            reg[m] = np.minimum(reg[m].astype(np.int32) + amp, 255).astype(np.uint8)
            anns[i, s] = [x, y, x + PATCH, y + PATCH, cls - 1]
        for _ in range(3):  # specks: per-image max never carries class signal
            sy = int(rng.integers(0, H - 6))
            sx = int(rng.integers(0, W - 6))
            img[sy:sy + 6, sx:sx + 6] = rng.integers(150, 161)
    return imgs, anns


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--init", choices=["random", "flagship", "compat"],
                    default="random")
    ap.add_argument("--ckpt", default="",
                    help="endpoint pickle for --init flagship/compat "
                    "(real_scale_learning --save-params output)")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--train-n", type=int, default=256)
    ap.add_argument("--eval-n", type=int, default=128)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.init != "random" and not args.ckpt:
        ap.error("--init flagship/compat requires --ckpt")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    _enable_compile_cache()

    from mammo_clip_tpu.downstream.detect import VINDR_DETECTION_CLASSES, evaluate_map
    from mammo_clip_tpu.downstream.experiments import make_detector_steps
    from mammo_clip_tpu.models.retinanet import RetinaNet, anchors_for, detect
    from mammo_clip_tpu.ops.augment import AugmentConfig, augment_batch, augment_batch_with_boxes
    from mammo_clip_tpu.train.optim import build_optimizer
    from mammo_clip_tpu.train.state import TrainState

    label = f"det-{args.init}-seed[{args.seed}]"
    # identical construction to bench_downstream.detector_bench -> cache hit
    model = RetinaNet(
        image_encoder_config={"name": "efficientnet-b5", "in_channels": 1,
                              "tpu_optimized": args.init != "compat"},
        num_classes=len(VINDR_DETECTION_CLASSES), dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(args.seed)}, jnp.zeros((1, H, W, 1)),
        train=False))()
    anchors = anchors_for((H, W))
    aug = AugmentConfig()

    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    if args.init != "random":
        with open(args.ckpt, "rb") as f:
            saved = pickle.load(f)
        params["image_encoder"] = jax.tree_util.tree_map(
            np.asarray, saved["params"]["image_encoder"])
        if "image_encoder" in saved.get("batch_stats", {}):
            batch_stats["image_encoder"] = jax.tree_util.tree_map(
                np.asarray, saved["batch_stats"]["image_encoder"])
        print(f"[{label}] backbone warm-started from {args.ckpt}", file=sys.stderr)

    def preprocess(batch, rng):
        b = dict(batch)
        if rng is None:
            b["images"] = augment_batch(b["images"], None, aug, MEAN, STD, train=False)
            return b
        b["images"], b["annotations"] = augment_batch_with_boxes(
            b["images"], b["annotations"], rng, aug, MEAN, STD, train=True)
        return b

    tx = build_optimizer({"name": "adam", "lr": 1e-4, "grad_clip_norm": 0.1},
                         lambda s: 1e-4)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)
    train_step, infer_step, _ = make_detector_steps(model, anchors, preprocess)

    print(f"[{label}] generating {args.train_n}+{args.eval_n} detection images "
          f"at {H}x{W}...", file=sys.stderr)
    tv, tann = make_detection_set(args.train_n, seed=11 + 100 * args.seed)
    ev, eann = make_detection_set(args.eval_n, seed=97 + 100 * args.seed)

    classes = VINDR_DETECTION_CLASSES

    def eval_map(st) -> dict:
        dets, anns_out = [], []
        for i in range(0, args.eval_n - B + 1, B):
            data = {"images": jnp.asarray(ev[i:i + B]),
                    "annotations": jnp.asarray(eann[i:i + B])}
            out = infer_step(st, data)
            d = detect(out, jnp.asarray(anchors), (H, W), score_threshold=0.05)
            for j in range(B):
                dets.append({k: np.asarray(v[j]) for k, v in d.items()})
                anns_out.append(eann[i + j])
        res = evaluate_map(dets, anns_out, len(classes), score_threshold=0.2,
                           class_names=classes)
        # synthetic classes 0/1/2 (square/disc/bars) land on the first three
        # VinDr names; absent classes are skipped by evaluate_map
        return {"mAP": round(float(res["mAP"]), 4),
                "ap_cls": {name: round(float(res[f"AP/{name}"]), 4)
                           for name in classes[:3] if f"AP/{name}" in res}}

    order_rng = np.random.default_rng(7 + 100 * args.seed)
    spe = args.train_n // B
    order = None
    rng = jax.random.PRNGKey(1 + 1000 * args.seed)
    loss_val = float("nan")
    t0 = time.time()
    for step in range(args.steps):
        k = step % spe
        if k == 0:
            order = order_rng.permutation(args.train_n)
        sel = order[k * B:(k + 1) * B]
        batch = {"images": jnp.asarray(tv[sel]), "annotations": jnp.asarray(tann[sel])}
        state, ld = train_step(state, batch, rng)
        if (step + 1) % 5 == 0:
            loss_val = float(ld["total"] if isinstance(ld, dict) else ld)
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            rec = {"arm": label, "step": step + 1, "loss": round(loss_val, 4)}
            rec.update(eval_map(state))
            rec["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps(rec))
            sys.stdout.flush()


if __name__ == "__main__":
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
