"""Parameter partitioning rules.

The reference's only parallelism is DDP with a full replica per GPU
(reference: trainer_ddp.py:134, SURVEY.md §2.2). Here parameters may additionally be
tensor-sharded over the mesh's 'model' axis (Megatron-style column/row splits for the
BERT FFN and attention projections) — a capability the reference lacks; with
``model=1`` (default) every spec degrades to full replication = pure DP.

Rules map parameter tree paths (joined with '/') to ``PartitionSpec``s; first regex
match wins, default replicated.

Image tower (r3): MBConv blocks get a Megatron-style split over the EXPANDED
channel dim — expand_conv column-split, depthwise + BN + SE gate sharded
channelwise along it, project_conv row-split (GSPMD inserts the psum after the
projection). Each block is one column->row pair, so the only per-block
collective is the output reduce; block I/O activations stay replicated across
'model'. Small leaves (stems, heads, SE squeeze bias, narrow early blocks)
stay replicated — sharding them buys nothing and costs collectives.
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
    # image tower: Megatron column->row pair over each MBConv's expanded dim
    # (conv kernels are HWIO). Depthwise kernels are (k, k, 1, E).
    (r"image_encoder/[^/]*block_\d+/expand_conv/kernel$", P(None, None, None, "model")),
    (r"image_encoder/[^/]*block_\d+/bn0/(scale|bias)$", P("model")),
    (r"image_encoder/[^/]*block_\d+/depthwise_conv/kernel$", P(None, None, None, "model")),
    (r"image_encoder/[^/]*block_\d+/bn1/(scale|bias)$", P("model")),
    (r"image_encoder/[^/]*block_\d+/se/reduce/kernel$", P(None, None, "model", None)),
    (r"image_encoder/[^/]*block_\d+/se/expand/kernel$", P(None, None, None, "model")),
    (r"image_encoder/[^/]*block_\d+/se/expand/bias$", P("model")),
    (r"image_encoder/[^/]*block_\d+/project_conv/kernel$", P(None, None, "model", None)),
    (r".*", P()),  # default: replicated
]


def spec_for_path(path: str) -> P:
    for pattern, spec in PARTITION_RULES:
        if re.search(pattern, path):
            return spec
    return P()


FSDP_MIN_SIZE = 2 ** 16  # don't bother sharding tiny leaves (BN scales, biases)


def fsdp_spec(shape, data_size: int, base: P) -> P:
    """ZeRO-3-style spec: shard the largest divisible dim of a big param over
    'data'. GSPMD then keeps only 1/data_size of the weights (and their optimizer
    moments) resident per chip and all-gathers them at use — the JAX equivalent of
    torch FSDP, with the collective riding ICI inside the compiled step.

    TP-sharded params (base != P()) are left on their Megatron split; a combined
    TP+FSDP split of the same tensor is possible but not worth it at this scale."""
    if base != P() or not shape:
        return base
    import math

    if math.prod(shape) < FSDP_MIN_SIZE:
        return P()
    dims = [d for d in range(len(shape)) if shape[d] % data_size == 0 and shape[d] > 1]
    if not dims:
        return P()
    d = max(dims, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[d] = "data"
    return P(*spec)


def shard_train_state(state, mesh: Mesh, fsdp: bool = False):
    """Place an entire TrainState on a mesh: params (and the optimizer moments that
    mirror them) per PARTITION_RULES, every other leaf replicated ON THE MESH.

    This is the production multi-chip entry point: a state built on one device (e.g.
    create_train_state or a checkpoint template) cannot be mixed with mesh-wide batch
    arrays under jit — jit refuses computations whose arguments live on different
    device sets — so every leaf, including scalars like ``step`` and optax's ``count``,
    must move to the mesh.
    """
    param_shardings = partition_params(state.params, mesh, fsdp=fsdp)
    flat_specs = {}
    for kp, sharding in jax.tree_util.tree_flatten_with_path(param_shardings)[0]:
        flat_specs["/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)] = sharding
    replicated = NamedSharding(mesh, P())

    def place(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        for p_path, sharding in flat_specs.items():
            # optimizer moments (mu/nu/...) mirror the param tree: match by suffix
            if path.endswith(p_path) and getattr(leaf, "shape", None) is not None:
                return jax.device_put(leaf, sharding)
        return jax.device_put(leaf, replicated)

    new_params = jax.device_put(state.params, param_shardings)
    new_opt = jax.tree_util.tree_map_with_path(place, state.opt_state)
    new_bs = jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated), state.batch_stats)
    return state.replace(
        params=new_params,
        opt_state=new_opt,
        batch_stats=new_bs,
        step=jax.device_put(state.step, replicated),
    )


def partition_params(params, mesh: Mesh, fsdp: bool = False):
    """Return a pytree of NamedShardings matching ``params``' structure.

    fsdp=True additionally shards every large still-replicated param over the
    'data' axis (see fsdp_spec)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    data_size = dict(mesh.shape).get("data", 1)
    model_size = dict(mesh.shape).get("model", 1)

    # Image-tower TP eligibility (structural, decided from the actual tree):
    # a block is sharded only when it HAS the Megatron sandwich — an expand_conv
    # to column-split ahead of the row-split projection — and its expanded dim
    # leaves >= 64 channels per shard. Without the gate the regexes also hit
    # e=1 blocks (no expand_conv: sharding their depthwise/BN forces GSPMD to
    # reshard the block's replicated input batch->channel EVERY block — the
    # "involuntary full rematerialization" SPMD warning) and narrow early
    # blocks where a lane-wide shard doesn't exist.
    eligible = set()
    for kp, leaf in flat:
        m = re.search(r"(.*block_\d+)/expand_conv/kernel$", path_str(kp))
        if m and getattr(leaf, "shape", None):
            e = leaf.shape[-1]
            if e % model_size == 0 and e // model_size >= 64:
                eligible.add(m.group(1))

    specs = {}
    for kp, leaf in flat:
        ps = path_str(kp)
        spec = spec_for_path(ps)
        if spec != P() and "image_encoder" in ps:
            bm = re.search(r"(.*block_\d+)/", ps)
            if bm and bm.group(1) not in eligible:
                spec = P()
        if fsdp:
            spec = fsdp_spec(getattr(leaf, "shape", ()), data_size, spec)
        specs[ps] = spec

    def assign(kp, _leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)
