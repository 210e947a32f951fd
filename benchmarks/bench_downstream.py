"""Downstream training-step benchmarks on real TPU.

Completes the perf story beyond pretraining: the reference's two production
fine-tuning paths (README.md:433-452 classifier, :510-529 detector) measured
as jitted steps on the chip.

* classifier: MammoClassifier (B5 backbone) @ 1520x912 grayscale, bs8,
  BCE — both 'lp' (frozen encoder, eval-mode BN, stop_gradient) and 'ft'
  (full finetune), with the on-device augmentation in the step.
* detector: RetinaNet over the B5 backbone taps @ 512x512 (cli/detector
  default resize), bs8, focal 0.25/2.0, box-aware augmentation in the step.

Usage: python benchmarks/bench_downstream.py [--which lp|ft|det] [--batch N]
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


def _sync_time(fn, sync, steps=10, groups=3):
    fn()
    sync()
    times = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(steps):
            fn()
        sync()
        times.append((time.perf_counter() - t0) / steps)
    return sorted(times)[len(times) // 2] * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all", choices=["all", "lp", "ft", "det"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--flagship", action="store_true",
                    help="tpu_optimized backbone (factory passthrough, r3) "
                    "instead of the reference-exact encoder")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from mammo_clip_tpu.ops.augment import AugmentConfig, augment_batch
    from mammo_clip_tpu.train.optim import build_optimizer
    from mammo_clip_tpu.train.state import TrainState

    r = np.random.default_rng(0)
    B = args.batch
    mean, std = 0.3089279, 0.2505356

    def classifier_bench(freeze: bool):
        from mammo_clip_tpu.downstream.classify import MammoClassifier
        from mammo_clip_tpu.downstream.experiments import make_classifier_steps

        H, W = 1520, 912
        model = MammoClassifier(
            image_encoder_config={"name": "efficientnet-b5", "in_channels": 1,
                                  "remat": not (freeze or args.flagship),
                                  "tpu_optimized": args.flagship},
            num_classes=1, freeze_encoder=freeze, dtype=jnp.bfloat16)
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 1)), train=False))()
        aug = AugmentConfig()

        def preprocess(batch, rng):
            b = dict(batch)
            b["images"] = augment_batch(b["images"], rng, aug, mean, std,
                                        train=rng is not None,
                                        out_dtype=jnp.bfloat16)
            return b

        tx = build_optimizer({"name": "adamw", "lr": 5e-5, "weight_decay": 1e-4},
                             lambda s: 5e-5)
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]), tx=tx)
        train_step, _ = make_classifier_steps(model, "bce", preprocess)
        batch = {"images": jnp.asarray(r.integers(0, 255, (B, H, W, 1), dtype=np.uint8)),
                 "labels": jnp.asarray((np.arange(B) % 2).astype(np.float32))}
        rng = jax.random.PRNGKey(1)
        holder = [state]

        def run():
            holder[0], loss = train_step(holder[0], batch, rng)
            holder.append(loss)

        ms = _sync_time(run, lambda: float(holder[-1]))
        print(json.dumps({"bench": ("flagship_" if args.flagship else "")
                          + "classifier_" + ("lp" if freeze else "ft"),
                          "resolution": f"{H}x{W}", "batch": B,
                          "ms_per_step": round(ms, 1),
                          "images_per_sec": round(B / (ms / 1e3), 1)}))

    def detector_bench():
        from mammo_clip_tpu.downstream.experiments import make_detector_steps
        from mammo_clip_tpu.models.retinanet import RetinaNet, anchors_for
        from mammo_clip_tpu.ops.augment import augment_batch_with_boxes
        from mammo_clip_tpu.downstream.detect import VINDR_DETECTION_CLASSES

        H = W = 512
        model = RetinaNet(
            image_encoder_config={"name": "efficientnet-b5", "in_channels": 1,
                                  "tpu_optimized": args.flagship},
            num_classes=len(VINDR_DETECTION_CLASSES), dtype=jnp.bfloat16)
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 1)), train=False))()
        anchors = anchors_for((H, W))
        aug = AugmentConfig()

        def preprocess(batch, rng):
            b = dict(batch)
            if rng is None:
                b["images"] = augment_batch(b["images"], None, aug, mean, std, train=False)
                return b
            b["images"], b["annotations"] = augment_batch_with_boxes(
                b["images"], b["annotations"], rng, aug, mean, std, train=True)
            return b

        tx = build_optimizer({"name": "adam", "lr": 1e-4, "grad_clip_norm": 0.1},
                             lambda s: 1e-4)
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]), tx=tx)
        train_step, _, _ = make_detector_steps(model, anchors, preprocess)
        ann = np.full((B, 16, 5), -1.0, np.float32)
        ann[:, 0] = [100, 120, 220, 260, 0]
        batch = {"images": jnp.asarray(r.integers(0, 255, (B, H, W, 1), dtype=np.uint8)),
                 "annotations": jnp.asarray(ann)}
        rng = jax.random.PRNGKey(1)
        holder = [state]

        def run():
            holder[0], loss = train_step(holder[0], batch, rng)
            holder.append(loss)

        ms = _sync_time(run, lambda: float(jnp.sum(holder[-1]["total"])
                                           if isinstance(holder[-1], dict)
                                           else holder[-1]))
        print(json.dumps({"bench": ("flagship_" if args.flagship else "") + "detector",
                          "resolution": f"{H}x{W}",
                          "batch": B, "ms_per_step": round(ms, 1),
                          "images_per_sec": round(B / (ms / 1e3), 1)}))

    if args.which in ("all", "lp"):
        classifier_bench(freeze=True)
    if args.which in ("all", "ft"):
        classifier_bench(freeze=False)
    if args.which in ("all", "det"):
        detector_bench()


if __name__ == "__main__":
    main()
