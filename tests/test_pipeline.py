"""Pipeline parallelism (parallel/pipeline.py): the GPipe shard_map schedule
must compute exactly what the sequential layer stack computes — forward AND
gradients — and compose with a data-parallel axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from mammo_clip_tpu.models.bert import BertConfig, BertEncoder
from mammo_clip_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_bert_hidden,
    stack_layer_params,
)


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _bert(num_layers=4, seed=0, B=8, S=16):
    cfg = BertConfig(
        vocab_size=64, hidden_size=16, num_layers=num_layers, num_heads=2,
        intermediate_size=32, max_position_embeddings=32, dropout_rate=0.0,
    )
    enc = BertEncoder(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, S), dtype=np.int32))
    mask = jnp.asarray((rng.random((B, S)) > 0.2).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    variables = enc.init(jax.random.PRNGKey(seed), ids, mask)
    return cfg, enc, variables, ids, mask


def test_stack_layer_params_shapes_and_order():
    cfg, enc, variables, ids, mask = _bert(num_layers=4)
    p = variables["params"]
    stacked = stack_layer_params(p, num_stages=2)
    k = stacked["attention"]["query"]["kernel"]
    assert k.shape[:2] == (2, 2)
    np.testing.assert_array_equal(
        np.asarray(k[0, 1]), np.asarray(p["layer_1"]["attention"]["query"]["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(k[1, 0]), np.asarray(p["layer_2"]["attention"]["query"]["kernel"])
    )
    with pytest.raises(ValueError):
        stack_layer_params(p, num_stages=3)


def test_pipeline_apply_identity_schedule():
    """A stage_fn that adds a per-stage constant: the pipeline must deliver each
    microbatch through every stage exactly once (sum of all stage constants)."""
    mesh = _mesh((4,), ("pipe",))
    # stage i adds (i+1); passing every stage once adds 1+2+3+4 = 10
    consts = jnp.arange(1.0, 5.0).reshape(4, 1, 1, 1)  # (stages, per=1, 1, 1)
    mbs = jnp.arange(24.0).reshape(6, 2, 2)  # (M=6, mb=2, feat=2)

    def stage_fn(stage_params, x):
        return x + jnp.sum(stage_params)

    run = jax.shard_map(
        lambda sp, xs: pipeline_apply(stage_fn, sp, xs, "pipe"),
        mesh=mesh, in_specs=(P("pipe"), P()), out_specs=P(),
    )
    out = run(consts, mbs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mbs) + 10.0, rtol=1e-6)


def test_pipelined_bert_forward_matches_sequential():
    cfg, enc, variables, ids, mask = _bert(num_layers=4)
    want = enc.apply(variables, ids, mask, deterministic=True)
    mesh = _mesh((4,), ("pipe",))
    got = jax.jit(
        lambda p, i, m: pipelined_bert_hidden(
            p, cfg, i, m, mesh, num_stages=4, num_microbatches=4)
    )(variables["params"], ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pipelined_bert_composes_with_data_axis():
    """('data', 'pipe') mesh: microbatches shard over 'data', layers over 'pipe'."""
    cfg, enc, variables, ids, mask = _bert(num_layers=4, B=8)
    want = enc.apply(variables, ids, mask, deterministic=True)
    mesh = _mesh((2, 4), ("data", "pipe"))
    got = jax.jit(
        lambda p, i, m: pipelined_bert_hidden(
            p, cfg, i, m, mesh, num_stages=4, num_microbatches=4,
            data_axis="data")
    )(variables["params"], ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pipelined_bert_gradients_match_sequential():
    """The schedule is differentiable (ppermute/psum transpose): grads of a
    scalar loss wrt the layer params must equal the sequential grads.

    Run in float64: a schedule bug (wrong microbatch routed, a grad path
    double-counted or dropped) survives any precision, while the fp32
    reassociation noise of the microbatched/scanned compute order — ~1e-5
    absolute on near-zero grad entries — collapses to ~1e-12, so the
    tolerance can certify exactness instead of excusing noise."""
    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        cfg, enc, variables, ids, mask = _bert(num_layers=4, B=4, S=8)
        params64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables["params"],
        )
        enc64 = BertEncoder(cfg, dtype=jnp.float64)
        mesh = _mesh((4,), ("pipe",))

        def seq_loss(params):
            h = enc64.apply({"params": params}, ids, mask, deterministic=True)
            return jnp.sum(h * h)

        def pipe_loss(params):
            h = pipelined_bert_hidden(
                params, cfg, ids, mask, mesh, num_stages=4, num_microbatches=2,
                dtype=jnp.float64)
            return jnp.sum(h * h)

        l_seq, g_seq = jax.jit(jax.value_and_grad(seq_loss))(params64)
        l_pipe, g_pipe = jax.jit(jax.value_and_grad(pipe_loss))(params64)
        np.testing.assert_allclose(float(l_pipe), float(l_seq), rtol=1e-12)
        for i in range(4):
            a = np.concatenate([np.asarray(x).ravel()
                                for x in jax.tree_util.tree_leaves(g_seq[f"layer_{i}"])])
            b = np.concatenate([np.asarray(x).ravel()
                                for x in jax.tree_util.tree_leaves(g_pipe[f"layer_{i}"])])
            np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11, err_msg=f"layer_{i}")
        # embedding grads flow through the pipeline entry too
        a = np.asarray(g_seq["word_embeddings"]["embedding"])
        b = np.asarray(g_pipe["word_embeddings"]["embedding"])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)
