"""Tutorial: extract vision-encoder embeddings from a Mammo-CLIP checkpoint.

Script-form equivalent of the reference's
notebooks/Tutorial/Get_Embedding_Vision_encoder_Mammo_CLIP_tutorial.ipynb.

    python examples/get_embeddings.py --checkpoint <orbax dir | reference .tar> \
        --images img1.png img2.png [--out embeddings.npy]
"""

from __future__ import annotations

import argparse

import numpy as np

from mammo_clip_tpu.eval.embeddings import EmbeddingExtractor
from mammo_clip_tpu.eval.loading import load_clip_for_eval


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--out", default="embeddings.npy")
    ap.add_argument("--texts", nargs="*", default=None, help="optionally embed texts too")
    args = ap.parse_args()

    model, variables, cfg = load_clip_for_eval(args.checkpoint)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    extractor = EmbeddingExtractor(model, variables, cfg.data.mean, cfg.data.std)

    import cv2

    imgs = []
    for p in args.images:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img.shape != (h, w):
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        imgs.append(img)
    emb = extractor.encode_images(np.stack(imgs)[..., None])
    np.save(args.out, emb)
    print(f"saved {emb.shape} image embeddings to {args.out}")

    if args.texts:
        from mammo_clip_tpu.data.tokenizer import load_tokenizer

        tok = load_tokenizer({"vocab_size": cfg.get_path("model.text_encoder.vocab_size", 28996)})
        enc = tok(args.texts, max_length=cfg.data.text_max_length)
        temb = extractor.encode_texts(enc["input_ids"], enc["attention_mask"])
        sims = emb @ temb.T
        print("image-text cosine similarities:\n", np.round(sims, 4))


if __name__ == "__main__":
    main()
