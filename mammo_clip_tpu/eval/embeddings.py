"""Batched embedding extraction (reference: evaluator.py:62-144 get_embeddings +
encode_image/encode_text helpers, tutorial-notebook API).

A jitted encode function per modality; batches stream through the device with static
shapes (the last partial batch is padded and the padding rows dropped on host).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.augment import minmax_standardize


class EmbeddingExtractor:
    """Wraps a MammoCLIP model + params for bulk image/text embedding."""

    def __init__(self, model, variables: Dict, mean: float, std: float, batch_size: int = 32):
        self.model = model
        self.variables = variables
        self.mean = mean
        self.std = std
        self.batch_size = batch_size

        def embed_images(variables, images):
            x = minmax_standardize(images, self.mean, self.std)
            return model.apply(variables, x, train=False, method=model.embed_image)

        def embed_texts(variables, input_ids, attention_mask):
            return model.apply(
                variables, input_ids, attention_mask, train=False, method=model.embed_text
            )

        self._embed_images = jax.jit(embed_images)
        self._embed_texts = jax.jit(embed_texts)

    def _pad(self, arr: np.ndarray) -> (np.ndarray, int):
        n = arr.shape[0]
        pad = (-n) % self.batch_size
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
        return arr, n

    def encode_images(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 1) uint8/float -> (N, D) L2-normalized fp32 embeddings."""
        padded, n = self._pad(np.asarray(images))
        outs = []
        for i in range(0, padded.shape[0], self.batch_size):
            outs.append(np.asarray(self._embed_images(self.variables, jnp.asarray(padded[i : i + self.batch_size]))))
        return np.concatenate(outs, axis=0)[:n]

    def encode_texts(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        padded_ids, n = self._pad(np.asarray(input_ids))
        padded_mask, _ = self._pad(np.asarray(attention_mask))
        outs = []
        for i in range(0, padded_ids.shape[0], self.batch_size):
            outs.append(
                np.asarray(
                    self._embed_texts(
                        self.variables,
                        jnp.asarray(padded_ids[i : i + self.batch_size]),
                        jnp.asarray(padded_mask[i : i + self.batch_size]),
                    )
                )
            )
        return np.concatenate(outs, axis=0)[:n]

    def run_dataset(self, batches: Iterable[Dict], label_keys: Iterable[str] = ()) -> Dict[str, np.ndarray]:
        """Stream a Batcher over the device, collecting embeddings + labels + texts —
        the reference's get_embeddings loop (evaluator.py:62-124)."""
        img_emb: List[np.ndarray] = []
        txt_emb: List[np.ndarray] = []
        labels: Dict[str, List] = {k: [] for k in label_keys}
        texts: List[str] = []
        for batch in batches:
            if "images" in batch:
                img_emb.append(self.encode_images(batch["images"]))
            if "input_ids" in batch:
                txt_emb.append(self.encode_texts(batch["input_ids"], batch["attention_mask"]))
            if "texts" in batch:
                texts.extend(batch["texts"])
            for k in label_keys:
                if k in batch:
                    labels[k].extend(np.asarray(batch[k]).tolist())
        out: Dict[str, np.ndarray] = {}
        if img_emb:
            out["image_embeddings"] = np.concatenate(img_emb, axis=0)
        if txt_emb:
            out["text_embeddings"] = np.concatenate(txt_emb, axis=0)
        if texts:
            out["texts"] = texts
        for k, v in labels.items():
            if v:
                out[k] = np.asarray(v)
        return out
