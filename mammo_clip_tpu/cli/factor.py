"""Mammo-FActOR training CLI (reference: notebooks/Mammo-Factor/Mammo-Factor.ipynb
cell 5 train_region_mapper — promoted out of the notebook per SURVEY.md §2).

    python -m mammo_clip_tpu.cli.factor --clip-checkpoint <ckpt> \
        --csv vindr_folds.csv --image-dir <pngs|shards> \
        [--attributes Mass Suspicious_Calcification] [--epochs 10]

Trains per-attribute region projection heads on Mass/Calc-positive rows with the
region-attribute max-similarity contrastive loss; the CLIP encoder stays frozen.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.images import open_image_store
from ..data.metadata import load_metadata, split_dataframe
from ..data.prompts import build_prompt_bank
from ..data.tokenizer import load_tokenizer
from ..eval.embeddings import EmbeddingExtractor
from ..eval.loading import load_clip_for_eval
from ..interpret.factor import FactorMapper, attribute_embeddings, factor_loss
from ..ops.augment import minmax_standardize
from ..train.checkpoint import save_checkpoint
from ..train.state import TrainState
from ..utils.cache import enable_compile_cache

# prompt sources per attribute: positive templates from the synthetic-report bank
_BANK_KEY = {"Mass": "Mass", "Suspicious_Calcification": "Suspicious Calcification"}


def main(argv=None) -> None:
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip-checkpoint", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--image-col", default="image_id")
    ap.add_argument("--attributes", nargs="+", default=["Mass", "Suspicious_Calcification"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--temperature", type=float, default=0.07)
    ap.add_argument("--workdir", default="outputs/factor")
    args = ap.parse_args(argv)

    clip_model, clip_vars, cfg = load_clip_for_eval(args.clip_checkpoint)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    mean, std = cfg.data.mean, cfg.data.std

    # attribute embeddings from the frozen text tower (notebook cell 1)
    extractor = EmbeddingExtractor(clip_model, clip_vars, mean, std, batch_size=args.batch_size)
    tokenizer = load_tokenizer({"vocab_size": cfg.get_path("model.text_encoder.vocab_size", 28996)})
    bank = build_prompt_bank()
    prompts = {
        a: bank[_BANK_KEY.get(a, a)]["pos_right"][:64] + bank[_BANK_KEY.get(a, a)]["pos_left"][:64]
        for a in args.attributes
    }
    attr_embs = attribute_embeddings(extractor, tokenizer, prompts,
                                     max_length=cfg.data.text_max_length)
    attr_mat = jnp.asarray(np.stack([attr_embs[a] for a in args.attributes]))

    # frozen-encoder feature extraction function
    def raw_features(images):
        x = minmax_standardize(images, mean, std)
        feats = clip_model.apply(clip_vars, x, train=False,
                                 method=lambda m, im, train: m.image_encoder(im, train=train))
        return feats["features"]

    raw_features = jax.jit(raw_features)

    # data: Mass/Calc-positive rows only (notebook cell 5)
    df = load_metadata(args.csv)
    mask = np.zeros(len(df), bool)
    for a in args.attributes:
        if a in df.columns:
            mask |= df[a].to_numpy() == 1
    df = df[mask].reset_index(drop=True)
    train_df = split_dataframe(df, "train")
    store = open_image_store(args.image_dir, (h, w))

    # mapper init needs the feature-map spatial size
    probe = store.get(str(train_df.iloc[0].get("study_id", train_df.iloc[0].get("patient_id", ""))),
                      str(train_df.iloc[0][args.image_col]))
    fm = raw_features(jnp.asarray(probe[None, ..., None]))
    _, fh, fw, _ = fm.shape
    mapper = FactorMapper(
        num_attributes=len(args.attributes),
        lang_dim=int(attr_mat.shape[1]),
        spatial_dim=fh * fw,
    )
    params = mapper.init(jax.random.PRNGKey(0), fm)["params"]
    tx = optax.adamw(args.lr)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params, batch_stats={},
                       opt_state=tx.init(params), tx=tx)

    @jax.jit
    def train_step(state, feats, labels):
        def compute(p):
            emb = mapper.apply({"params": p}, feats)
            return factor_loss(emb, attr_mat, labels, temperature=args.temperature)

        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads), loss

    bs = args.batch_size
    last_loss = float("nan")
    for epoch in range(args.epochs):
        order = np.random.default_rng(epoch).permutation(len(train_df))
        for i in range(0, len(order) - bs + 1, bs):
            rows = train_df.iloc[order[i : i + bs]]
            imgs = np.stack([
                store.get(str(r.get("study_id", r.get("patient_id", ""))), str(r[args.image_col]))
                for _, r in rows.iterrows()
            ])[..., None]
            labels = jnp.asarray(rows[args.attributes].to_numpy().astype(np.float32))
            feats = raw_features(jnp.asarray(imgs))
            state, loss = train_step(state, feats, labels)
            last_loss = float(loss)
        print(f"epoch {epoch + 1}: loss={last_loss:.4f}")

    save_checkpoint(f"{args.workdir}/mapper", state,
                    config={"attributes": args.attributes, "temperature": args.temperature},
                    extra_meta={"final_loss": last_loss}, max_to_keep=1)
    print(json.dumps({"final_loss": last_loss}))


if __name__ == "__main__":
    main()
