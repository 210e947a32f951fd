"""AOT serving export: serialize the trained dual encoder to StableHLO.

A production-serving capability the reference lacks (its eval scripts re-build
the torch model from source every time): the image- and text-embedding
functions are jitted with the trained parameters BAKED IN as constants and
serialized via ``jax.export`` to portable StableHLO artifacts. A serving
process (same or newer jax, any XLA backend — TPU serving pods, CPU canaries)
deserializes and calls them without importing this package or any model code.

The exported contract matches eval/embeddings.EmbeddingExtractor:
  image_fn(images float32 (N, H, W, 1), already normalized) -> (N, D) unit-norm
  text_fn(input_ids int32 (N, S), attention_mask int32 (N, S)) -> (N, D)

Shapes are static per artifact (one artifact per serving batch shape — the
TPU-native convention; export several sizes for bucketed serving).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_clip_serving(
    model,
    variables,
    image_hw: Tuple[int, int],
    text_len: int,
    batch: int,
    out_dir: str,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> Dict[str, str]:
    """Serialize embed-image / embed-text with baked parameters.

    Writes ``image_fn.shlo``, ``text_fn.shlo`` and a ``serving.json`` manifest
    (shapes, dtypes, embedding dim, platform list) to ``out_dir``; returns the
    file map. ``platforms`` sets the lowering targets baked into the artifact —
    jax.export otherwise pins the single platform active at export time, and an
    artifact exported on a TPU pod would refuse to run on a CPU canary.
    """
    h, w = image_hw

    def image_fn(images):
        return model.apply(variables, images, train=False,
                           method=model.embed_image)

    def text_fn(input_ids, attention_mask):
        return model.apply(variables, input_ids, attention_mask, train=False,
                           method=model.embed_text)

    img_spec = jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32)
    ids_spec = jax.ShapeDtypeStruct((batch, text_len), jnp.int32)

    exp_img = jax_export.export(jax.jit(image_fn), platforms=list(platforms))(img_spec)
    exp_txt = jax_export.export(jax.jit(text_fn), platforms=list(platforms))(ids_spec, ids_spec)

    os.makedirs(out_dir, exist_ok=True)
    files = {}
    for name, exp in (("image_fn", exp_img), ("text_fn", exp_txt)):
        path = os.path.join(out_dir, f"{name}.shlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        files[name] = path
    dim = int(exp_img.out_avals[0].shape[-1])
    manifest = {
        "image_input": [batch, h, w, 1],
        "text_input": [batch, text_len],
        "embedding_dim": dim,
        "platforms": list(platforms),
        "contract": "normalized float32 NHWC images; int32 ids+mask; "
                    "outputs are L2-normalized embeddings",
    }
    mpath = os.path.join(out_dir, "serving.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    files["manifest"] = mpath
    return files


class ServingModule:
    """Deserialized serving artifact: callable embedders, no model code needed."""

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, "serving.json")) as f:
            self.manifest = json.load(f)
        with open(os.path.join(out_dir, "image_fn.shlo"), "rb") as f:
            self._image = jax_export.deserialize(f.read())
        with open(os.path.join(out_dir, "text_fn.shlo"), "rb") as f:
            self._text = jax_export.deserialize(f.read())

    def embed_images(self, images):
        return self._image.call(images)

    def embed_texts(self, input_ids, attention_mask):
        return self._text.call(input_ids, attention_mask)
