"""Tutorial: train a downstream classifier on top of a Mammo-CLIP checkpoint.

Script-form equivalent of the reference's
notebooks/Tutorial/Downstream_classifier_tutorial.ipynb: load the CLIP checkpoint,
build a frozen-encoder linear probe, train a few epochs, report AUROC.

    python examples/downstream_classifier.py --checkpoint <ckpt> \
        --csv folds.csv --image-dir <pngs|shards> --label cancer
"""

from __future__ import annotations

import argparse

from mammo_clip_tpu.cli import classifier


def main() -> None:
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--checkpoint", required=True)
    args, rest = ap.parse_known_args()
    classifier.main(["--clip-checkpoint", args.checkpoint, "--arch", "lp", *rest])


if __name__ == "__main__":
    main()
