"""Parameter partitioning rules.

The reference's only parallelism is DDP with a full replica per GPU
(reference: trainer_ddp.py:134, SURVEY.md §2.2). Here parameters may additionally be
tensor-sharded over the mesh's 'model' axis (Megatron-style column/row splits for the
BERT FFN and attention projections) — a capability the reference lacks; with
``model=1`` (default) every spec degrades to full replication = pure DP.

Rules map parameter tree paths (joined with '/') to ``PartitionSpec``s; first regex
match wins, default replicated. Convolution kernels stay replicated: at this model
scale conv weights are small relative to activations, and replicated weights keep the
conv + BN fusion local (no weight collectives in the hot loop).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'path/to/param', spec). DenseGeneral QKV kernels are (H, heads, head_dim);
# attention output kernel is (heads, head_dim, H); FFN kernels are 2-D.
PARTITION_RULES: List[Tuple[str, P]] = [
    (r"text_encoder/layer_\d+/attention/(query|key|value)/kernel$", P(None, "model", None)),
    (r"text_encoder/layer_\d+/attention/(query|key|value)/bias$", P("model", None)),
    (r"text_encoder/layer_\d+/attention/output/kernel$", P("model", None, None)),
    (r"text_encoder/layer_\d+/intermediate/kernel$", P(None, "model")),
    (r"text_encoder/layer_\d+/intermediate/bias$", P("model")),
    (r"text_encoder/layer_\d+/ffn_output/kernel$", P("model", None)),
    (r"text_encoder/word_embeddings/embedding$", P(None, None)),
    (r".*", P()),  # default: replicated
]


def spec_for_path(path: str) -> P:
    for pattern, spec in PARTITION_RULES:
        if re.search(pattern, path):
            return spec
    return P()


def partition_params(params, mesh: Mesh):
    """Return a pytree of NamedShardings matching ``params``' structure."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    specs = {path_str(kp): spec_for_path(path_str(kp)) for kp, _ in flat}

    def assign(kp, _leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)
