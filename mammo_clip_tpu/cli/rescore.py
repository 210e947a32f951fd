"""Offline re-scoring of persisted validation predictions.

The downstream drivers persist the best checkpoint's validation
``predictions``/``labels`` arrays (arrays.npz sidecar, r3) — the parity
artifact for the reference's embedded-predictions workflow
(reference: Classifiers/experiments.py:193-222 saves ``predictions`` in its
best checkpoints; its offline analyses re-score them without re-running
inference). This CLI recomputes metrics from that artifact alone: no model
build, no device.

    python -m mammo_clip_tpu.cli.rescore --checkpoint outputs/classifier/best \
        [--metric auroc|pfbeta|accuracy] [--threshold 0.5]

Prints one JSON line with every requested metric.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..eval.metrics import auroc, pfbeta
from ..train.checkpoint import load_checkpoint_arrays


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir whose best step carries arrays.npz")
    ap.add_argument("--metric", action="append", default=None,
                    choices=["auroc", "pfbeta", "accuracy"],
                    help="repeatable; default: all")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="binarization threshold for accuracy")
    args = ap.parse_args(argv)

    arrays = load_checkpoint_arrays(args.checkpoint)
    if not arrays:
        raise SystemExit(f"no arrays.npz under {args.checkpoint} "
                         "(older checkpoint? re-run training to persist predictions)")
    preds = np.asarray(arrays["predictions"], np.float64)
    labels = np.asarray(arrays["labels"], np.float64)

    metrics = args.metric or ["auroc", "pfbeta", "accuracy"]
    out = {"n": int(preds.shape[0])}
    if "auroc" in metrics:
        out["auroc"] = float(auroc(labels, preds))
    if "pfbeta" in metrics:
        out["pfbeta"] = float(pfbeta(labels, preds))
    if "accuracy" in metrics:
        if preds.ndim > 1:  # multi-class probabilities
            out["accuracy"] = float(np.mean(preds.argmax(-1) == labels))
        else:
            out["accuracy"] = float(np.mean((preds >= args.threshold) == (labels > 0.5)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
