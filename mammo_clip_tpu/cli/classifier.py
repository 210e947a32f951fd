"""Downstream classifier CLI (reference: src/codebase/train_classifier.py:14-156).

    python -m mammo_clip_tpu.cli.classifier --clip-checkpoint <ckpt> \
        --csv <folds.csv> --image-dir <pngs|shards> --label cancer \
        --arch lp|ft [--dataset rsna|vindr] [--epochs 30] ...

Replaces the reference's ~40 argparse flags with the load-bearing subset; class-balance
pos-weights come from downstream.classify.POS_WEIGHTS (train_classifier.py:113-141).
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np
import pandas as pd

from ..core.config import Config
from ..data.datasets import ImageClassificationDataset
from ..data.images import open_image_store
from ..data.metadata import load_metadata, split_dataframe, subsample
from ..downstream.classify import POS_WEIGHTS, classifier_from_clip_checkpoint, aggregate_rsna_predictions
from ..downstream.experiments import train_classifier
from ..eval.loading import load_clip_for_eval
from ..ops.augment import AugmentConfig
from ..utils.cache import enable_compile_cache


def _batches(ds, batch_size, shuffle, seed=0, with_meta=False):
    import jax.numpy as jnp

    n = len(ds)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, n - batch_size + 1, batch_size):
        items = [ds[int(j)] for j in order[i : i + batch_size]]
        batch = {
            "images": jnp.asarray(np.stack([it["image"] for it in items])[..., None]),
            "labels": jnp.asarray(np.asarray([it["label"] for it in items])),
        }
        if with_meta:
            batch["meta"] = [it.get("meta") for it in items]
        yield batch


def main(argv=None) -> None:
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip-checkpoint", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--label", default="cancer")
    ap.add_argument("--dataset", default="rsna", choices=["rsna", "vindr"])
    ap.add_argument("--arch", default="lp", choices=["lp", "ft"],
                    help="lp = frozen encoder linear probe, ft = full finetune")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--data-frac", type=float, default=1.0)
    ap.add_argument("--num-classes", type=int, default=1)
    ap.add_argument("--weighted-bce", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume from workdir/checkpoints")
    ap.add_argument("--workdir", default="outputs/classifier")
    args = ap.parse_args(argv)

    clip_model, clip_vars, clip_cfg = load_clip_for_eval(args.clip_checkpoint)
    h, w = clip_cfg.data.image_size_h, clip_cfg.data.image_size_w
    model, variables = classifier_from_clip_checkpoint(
        clip_cfg.to_dict(), clip_vars, num_classes=args.num_classes,
        freeze_encoder=args.arch == "lp", example_shape=(1, h, w, 1),
    )

    df = load_metadata(args.csv)
    train_df = subsample(split_dataframe(df, "train", args.fold), args.data_frac)
    valid_df = split_dataframe(df, "valid", args.fold)
    store = open_image_store(args.image_dir, (h, w))
    train_ds = ImageClassificationDataset(train_df, store, label_col=args.label)
    valid_ds = ImageClassificationDataset(valid_df, store, label_col=args.label)

    pos_weight = POS_WEIGHTS.get(f"{args.dataset}/{args.label}") if args.weighted_bce else None
    loss_kind = "ce" if args.label in ("density", "birads") else "bce"

    aggregate = None
    if args.dataset == "rsna":
        ids = valid_df[["patient_id", "laterality"]].reset_index(drop=True)

        def aggregate(preds, labels, meta):  # noqa: F811
            n = len(preds)
            sub = ids.iloc[:n].copy()
            sub["pred"] = preds
            sub["label"] = labels
            agg = sub.groupby(["patient_id", "laterality"])[["pred", "label"]].mean()
            return agg["pred"].to_numpy(), agg["label"].to_numpy()

    res = train_classifier(
        model,
        variables,
        lambda epoch: _batches(train_ds, args.batch_size, True, seed=epoch),
        lambda: _batches(valid_ds, args.batch_size, False),
        epochs=args.epochs,
        steps_per_epoch=max(len(train_ds) // args.batch_size, 1),
        lr=args.lr,
        weight_decay=args.weight_decay,
        loss_kind=loss_kind,
        pos_weight=pos_weight,
        mean=clip_cfg.data.mean,
        std=clip_cfg.data.std,
        workdir=args.workdir,
        config=Config({"clip": clip_cfg.to_dict(), "label": args.label, "arch": args.arch}).to_dict(),
        aggregate=aggregate,
        resume=args.resume,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
