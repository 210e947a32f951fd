"""GPipe-style pipeline parallelism (explicit shard_map + ppermute schedule).

The text tower is the one homogeneous layer stack in the framework (12
identical BertLayers), so it is the natural pipeline target: stage ``i`` of a
``num_stages``-way pipeline holds layers ``[i*L/P, (i+1)*L/P)`` and
microbatches stream through the stages over a 'pipe' mesh axis via
``lax.ppermute``. This is a TPU-native expression of pipeline parallelism —
a compiled ``lax.scan`` over ticks with ICI point-to-point transfers, no
host-side scheduler — and beyond-reference capability (the reference is
DDP-only, reference: trainer_ddp.py:134; every GPU holds all 12 layers).

Schedule: the plain GPipe loop-skew. With M microbatches and P stages the
scan runs T = M + P - 1 ticks; at tick t stage 0 ingests microbatch t (zeros
once the real ones run out), every stage applies its layer block to whatever
sits in its buffer, and ``ppermute`` shifts results one stage down the chain.
Stage P-1 emits microbatch t-(P-1) at tick t, so the last M tick-outputs are
the pipeline's outputs; a ``psum`` over the pipe axis replicates them (every
other stage contributes zeros). The (P-1)/T bubble is the textbook GPipe
cost — interleaved 1F1B is a scheduling refinement on top of the same
primitives, out of scope while nothing in the model zoo exceeds 12 layers.

Composes with data parallelism: run the mesh as ('data', 'pipe') and shard
the microbatch dim over 'data' — each data shard streams its own microbatches
through its own pipe group. Differentiable end-to-end (``ppermute``/``psum``
transpose cleanly), so the pipelined forward can sit inside a training loss.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(params: dict, num_stages: int, prefix: str = "layer_"):
    """Stack the per-layer parameter subtrees ``params[f'{prefix}{i}']`` into a
    single pytree whose leaves carry a leading (num_stages, layers_per_stage)
    axis — the layout ``pipeline_apply`` shards over the pipe axis.

    The per-layer trees must be homogeneous (same structure and shapes), which
    holds for every BertLayer.
    """
    names = sorted(
        (k for k in params if k.startswith(prefix) and k[len(prefix):].isdigit()),
        key=lambda k: int(k[len(prefix):]),
    )
    if not names:
        raise ValueError(f"no '{prefix}<i>' subtrees in params")
    num_layers = len(names)
    if num_layers % num_stages:
        raise ValueError(f"{num_layers} layers not divisible by {num_stages} stages")
    per = num_layers // num_stages
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(num_stages, per, *leaves[0].shape),
        *[params[n] for n in names],
    )


def pipeline_apply(stage_fn: Callable, stage_params, microbatches, axis_name: str = "pipe"):
    """The per-device GPipe schedule; call INSIDE ``shard_map`` over ``axis_name``.

    stage_fn(stage_params, mb) -> mb': applies this stage's layer block; input
      and output microbatch pytrees must have identical structure/shapes
      (homogeneous pipeline).
    stage_params: this device's parameter shard (leading stage axis of size 1
      from ``in_specs=P(axis_name)`` is squeezed here).
    microbatches: pytree with leading (M, mb, ...) axes, replicated over
      ``axis_name`` (shard any OTHER mesh axis over the mb dim as usual).

    Returns the (M, mb, ...) outputs, replicated over ``axis_name``.
    """
    n_stages = jax.lax.axis_size(axis_name)
    stage_idx = jax.lax.axis_index(axis_name)
    stage_params = jax.tree_util.tree_map(
        lambda a: jnp.squeeze(a, 0), stage_params
    )
    leaves = jax.tree_util.tree_leaves(microbatches)
    num_mb = leaves[0].shape[0]

    # pad with (P-1) zero microbatches: stage 0 ingests them during drain ticks
    def pad(a):
        z = jnp.zeros((n_stages - 1, *a.shape[1:]), a.dtype)
        return jnp.concatenate([a, z], axis=0)

    xs = jax.tree_util.tree_map(pad, microbatches)
    # the carry becomes device-varying after the first ppermute; the initial
    # zeros must carry the same varying-manual-axes type (shard_map VMA typing):
    # varying over the pipe axis plus whatever axes the microbatches already
    # vary over (e.g. a 'data' axis sharding the mb dim)
    def zeros_like_mb(a):
        axes = tuple(set(jax.typeof(a).vma) | {axis_name})
        return jax.lax.pcast(jnp.zeros(a.shape[1:], a.dtype), axes, to="varying")

    carry0 = jax.tree_util.tree_map(zeros_like_mb, microbatches)
    # shift chain i -> i+1; stage 0 receives nothing (zeros), and only ever
    # reads its scan input, so the missing wraparound edge is never observed
    shift = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, x_t):
        x_in = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stage_idx == 0, a, b), x_t, carry
        )
        y = stage_fn(stage_params, x_in)
        carry_next = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis_name, shift), y
        )
        y_out = jax.tree_util.tree_map(
            lambda a: jnp.where(stage_idx == n_stages - 1, a, jnp.zeros_like(a)), y
        )
        return carry_next, y_out

    _, ys = jax.lax.scan(tick, carry0, xs)
    # stage P-1 emits microbatch t-(P-1) at tick t: keep the last M ticks,
    # then psum-replicate (all other stages contributed zeros)
    outs = jax.tree_util.tree_map(lambda a: a[n_stages - 1:], ys)
    return jax.lax.psum(outs, axis_name)


def pipelined_bert_hidden(
    params: dict,
    cfg,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    mesh: Mesh,
    num_stages: int,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: str | None = None,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """``BertEncoder``-equivalent last_hidden_state with the 12-layer stack
    pipelined over ``pipe_axis`` (deterministic mode — the pipeline path is
    for serving / capability demonstration; dropout stays off).

    Embeddings and the final pooling stay replicated — they are <2% of the
    text-tower FLOPs. ``params`` is the BertEncoder subtree (e.g.
    ``variables['params']['text_encoder']``); numerics match
    ``BertEncoder.apply`` to fp tolerance (tests/test_pipeline.py).
    """
    import flax.linen as nn

    from ..models.bert import BertLayer

    B, S = input_ids.shape
    if B % num_microbatches:
        raise ValueError(f"batch {B} not divisible by {num_microbatches} microbatches")

    word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype).apply(
        {"params": params["word_embeddings"]}, input_ids)
    pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=dtype).apply(
        {"params": params["position_embeddings"]}, jnp.arange(S)[None, :])
    typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=dtype).apply(
        {"params": params["token_type_embeddings"]}, jnp.zeros_like(input_ids))
    x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype).apply(
        {"params": params["embeddings_ln"]}, word + pos + typ)

    mb = B // num_microbatches
    x_mb = x.reshape(num_microbatches, mb, S, cfg.hidden_size)
    mask_mb = attention_mask.astype(bool).reshape(num_microbatches, mb, S)

    layer = BertLayer(cfg, dtype=dtype)
    stacked = stack_layer_params(params, num_stages)

    def stage_fn(stage_params, xm):
        h, m = xm

        def body(carry, layer_params):
            return layer.apply({"params": layer_params}, carry, m, True), None

        h, _ = jax.lax.scan(body, h, stage_params)
        return h, m

    mb_spec = P(None, data_axis) if data_axis else P()
    run = jax.shard_map(
        lambda sp, xs, ms: pipeline_apply(stage_fn, sp, (xs, ms), pipe_axis),
        mesh=mesh,
        in_specs=(P(pipe_axis), mb_spec, mb_spec),
        out_specs=(mb_spec, mb_spec),
    )
    out_mb, _ = run(stacked, x_mb, mask_mb)
    return out_mb.reshape(B, S, cfg.hidden_size)
