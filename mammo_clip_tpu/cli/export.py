"""Serving-export CLI: checkpoint -> self-contained StableHLO artifacts.

Loads a trained checkpoint (native Orbax dir OR a reference ``.tar``) through
the same path every evaluator uses (eval/loading.load_clip_for_eval — the
checkpoint-embeds-its-config contract), then serializes the image/text
embedders with parameters baked in (utils/export.py). The output directory is
everything a serving process needs: two ``.shlo`` files + ``serving.json``;
no model code, no checkpoint, no config required at serving time.

Usage:
  python -m mammo_clip_tpu.cli.export --checkpoint outputs/b5/best \
      --out serving/b5 [--batch 8] [--image-size H W] [--text-len 256]
"""

from __future__ import annotations

import argparse
import json

from ..utils.cache import enable_compile_cache


def main(argv=None) -> None:
    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="Orbax checkpoint dir or reference .tar")
    ap.add_argument("--out", required=True, help="output artifact directory")
    ap.add_argument("--batch", type=int, default=8,
                    help="serving batch size baked into the artifact shapes")
    ap.add_argument("--image-size", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="override the checkpoint config's image size")
    ap.add_argument("--text-len", type=int, default=None,
                    help="override the checkpoint config's text length")
    args = ap.parse_args(argv)

    from ..eval.loading import load_clip_for_eval
    from ..utils.export import export_clip_serving

    model, variables, cfg = load_clip_for_eval(args.checkpoint)
    h, w = args.image_size or (cfg.data.image_size_h, cfg.data.image_size_w)
    text_len = args.text_len or cfg.data.text_max_length
    files = export_clip_serving(model, variables, (h, w), text_len,
                                batch=args.batch, out_dir=args.out)
    print(json.dumps({"exported": files, "image_size": [h, w],
                      "text_len": text_len, "batch": args.batch}))


if __name__ == "__main__":
    main()
