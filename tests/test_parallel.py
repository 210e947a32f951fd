"""Explicit-collective (shard_map) loss vs the GSPMD global-batch loss, plus
partitioning rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mammo_clip_tpu.core.mesh import MeshContext, make_mesh
from mammo_clip_tpu.losses import multi_positive_clip_loss, contrastive_clip_loss
from mammo_clip_tpu.parallel.partitioning import spec_for_path
from mammo_clip_tpu.parallel.shard_loss import shard_map_clip_loss


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _embs(seed, n=16, d=8):
    rng = np.random.default_rng(seed)
    return jnp.asarray(_norm(rng.standard_normal((n, d)).astype(np.float32)))


def test_shard_map_loss_matches_global_multipositive():
    mesh = make_mesh(data=8, model=1)
    i1, t1, t2, i2 = _embs(0), _embs(1), _embs(2), _embs(3)
    scale = jnp.asarray(14.2857, jnp.float32)

    global_out = multi_positive_clip_loss(
        image_embeddings=i1, text_embeddings=t1, text_embeddings2=t2,
        image_view_embeddings=i2, logit_scale=scale,
        i2i_weight=1.0, t2t_weight=0.5,
    )

    fn = jax.shard_map(
        lambda a, b, c, d: shard_map_clip_loss(
            a, b, scale, axis_name="data", text_embeddings2=c, image_view_embeddings=d,
            i2i_weight=1.0, t2t_weight=0.5,
        ),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs={k: P() for k in ("contrastive", "i2t", "t2i", "i2i", "t2t")},
    )
    sharded_out = fn(i1, t1, t2, i2)
    for k in global_out:
        np.testing.assert_allclose(
            float(sharded_out[k]), float(global_out[k]), rtol=1e-5, err_msg=k
        )


def test_shard_map_loss_single_pair():
    mesh = make_mesh(data=8, model=1)
    i1, t1 = _embs(4), _embs(5)
    scale = jnp.asarray(10.0, jnp.float32)
    global_out = contrastive_clip_loss(
        image_embeddings=i1, text_embeddings=t1, logit_scale=scale,
        i2t_weight=0.5, t2i_weight=0.5,
    )
    fn = jax.shard_map(
        lambda a, b: shard_map_clip_loss(a, b, scale, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs={k: P() for k in ("contrastive", "i2t", "t2i")},
    )
    out = fn(i1, t1)
    np.testing.assert_allclose(float(out["contrastive"]), float(global_out["contrastive"]), rtol=1e-5)


def test_partition_rules():
    assert spec_for_path("text_encoder/layer_3/attention/query/kernel") == P(None, "model", None)
    assert spec_for_path("text_encoder/layer_0/intermediate/kernel") == P(None, "model")
    assert spec_for_path("text_encoder/layer_11/ffn_output/kernel") == P("model", None)
    # r3: image tower gets a Megatron column->row pair over the expanded dim
    assert spec_for_path("image_encoder/block_5/depthwise_conv/kernel") == P(None, None, None, "model")
    assert spec_for_path("image_encoder/block_5/expand_conv/kernel") == P(None, None, None, "model")
    assert spec_for_path("image_encoder/block_5/project_conv/kernel") == P(None, None, "model", None)
    assert spec_for_path("image_encoder/tpu_front_block_0/project_conv/kernel") == P(None, None, "model", None)
    assert spec_for_path("image_encoder/stem_conv/kernel") == P()
    assert spec_for_path("image_encoder/head_conv/kernel") == P()
    assert spec_for_path("logit_scale") == P()


def test_multiprocess_batcher_sharding_disjoint_and_complete():
    """Simulated process_count=4 input pipeline: per-process index slices are
    disjoint, cover the epoch, and concat-of-local-batches == a consistent global
    batch (the multi-host SPMD contract behind MeshContext.shard_host_batch)."""
    import numpy as np

    from mammo_clip_tpu.data.pipeline import Batcher
    from mammo_clip_tpu.data.tokenizer import HashTokenizer

    class TinyDs:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            img = np.full((8, 6), i, np.uint8)
            return {"image": img, "text": f"sample {i}", "label": i}

    tok = HashTokenizer(vocab_size=128)
    P = 4
    batchers = [
        Batcher(TinyDs(), tok, batch_size=4, max_length=8, seed=3,
                process_index=p, process_count=P)
        for p in range(P)
    ]
    for b in batchers:
        b.set_epoch(1)

    slices = [b._indices() for b in batchers]
    all_idx = np.concatenate(slices)
    assert len(all_idx) == 64
    assert len(set(all_idx.tolist())) == 64  # disjoint AND complete

    # same epoch -> every process agrees on the global permutation
    per_proc = [list(iter(b)) for b in batchers]
    n_batches = len(batchers[0])
    assert all(len(pb) == n_batches for pb in per_proc)
    # global batch b = concat of process-local batches (device order): labels must
    # be exactly the first global_batch entries of the shared permutation,
    # interleaved process-strided
    gb = np.concatenate([per_proc[p][0]["labels"] for p in range(P)])
    rng = np.random.default_rng(3 * 100_003 + 1)
    order = np.arange(64)
    rng.shuffle(order)
    expect = np.concatenate([order[p::P][:4] for p in range(P)])
    np.testing.assert_array_equal(np.sort(gb), np.sort(expect))
    np.testing.assert_array_equal(gb, expect)


def test_shard_host_batch_places_global_batch():
    """shard_host_batch shards the batch dim over the full mesh (single process)."""
    import numpy as np

    from mammo_clip_tpu.core.mesh import MeshContext

    ctx = MeshContext.create(data=8, model=1)
    batch = {"images": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
    out = ctx.shard_host_batch(batch)
    arr = out["images"]
    assert arr.shape == (16, 4)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), batch["images"])


def test_fsdp_sharding_matches_replicated_loss():
    """fsdp=True (ZeRO-3 params over 'data') computes the same train step as
    replicated params, with the big leaves actually sharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.core.mesh import MeshContext
    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.parallel.partitioning import shard_train_state
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
        warmup_cosine_sq_schedule,
    )

    ctx = MeshContext.create(data=4, model=2)
    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    loss_fn = build_loss(cfg.loss.to_dict())
    tx = build_optimizer(cfg.optimizer.to_dict(),
                         warmup_cosine_sq_schedule(cfg.optimizer.lr, 100, 10))
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    v = cfg.model.text_encoder.vocab_size
    ids = rng.integers(1, v, size=(8, s), dtype=np.int32)
    batch = {
        "images": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "image_views": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "input_ids": ids, "attention_mask": np.ones((8, s), np.int32),
        "input_ids2": ids, "attention_mask2": np.ones((8, s), np.int32),
    }
    batch = ctx.shard_host_batch(batch)
    base = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, donate=False)

    s_rep = shard_train_state(base, ctx.mesh)
    s_fsdp = shard_train_state(base, ctx.mesh, fsdp=True)
    # at least one big leaf is genuinely sharded over 'data'
    shardings = [l.sharding.spec for l in jax.tree_util.tree_leaves(s_fsdp.params)
                 if hasattr(l, "sharding")]
    assert any("data" in str(sp) for sp in shardings)

    _, l_rep = step(s_rep, batch, jax.random.PRNGKey(1))
    _, l_fsdp = step(s_fsdp, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l_rep["total"]), float(l_fsdp["total"]),
                               rtol=2e-5)


def test_replica_axis_matches_flat_data_mesh():
    """A ('replica','data','model') = 2x2x2 mesh (cross-slice DP over 'replica',
    FSDP over the intra-slice 'data' axis) computes the same step as the flat
    8-way mesh, and the batch is sharded over all 8 devices."""
    import jax
    import numpy as np

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.core.mesh import MeshContext
    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.parallel.partitioning import shard_train_state
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
        warmup_cosine_sq_schedule,
    )

    ctx3 = MeshContext.create(data=2, model=2, replica=2)
    assert ctx3.replica_parallelism == 2 and ctx3.data_parallelism == 2
    ctx2 = MeshContext.create(data=4, model=2)
    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    loss_fn = build_loss(cfg.loss.to_dict())
    tx = build_optimizer(cfg.optimizer.to_dict(),
                         warmup_cosine_sq_schedule(cfg.optimizer.lr, 100, 10))
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    v = cfg.model.text_encoder.vocab_size
    ids = rng.integers(1, v, size=(8, s), dtype=np.int32)
    host = {
        "images": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "image_views": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "input_ids": ids, "attention_mask": np.ones((8, s), np.int32),
        "input_ids2": ids, "attention_mask2": np.ones((8, s), np.int32),
    }
    step = make_train_step(model, loss_fn, donate=False)

    b3 = ctx3.shard_host_batch(host)
    assert len(b3["images"].sharding.device_set) == 8
    base = create_train_state(model, b3, tx, jax.random.PRNGKey(0))
    s3 = shard_train_state(base, ctx3.mesh, fsdp=True)
    n3, l3 = step(s3, b3, jax.random.PRNGKey(1))

    b2 = ctx2.shard_host_batch(host)
    s2 = shard_train_state(base, ctx2.mesh)
    n2, l2 = step(s2, b2, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(l3["total"]), float(l2["total"]), rtol=2e-5)
    # updated params agree across the two mesh topologies
    f3 = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(n3.params)])
    f2 = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(n2.params)])
    np.testing.assert_allclose(f3, f2, rtol=5e-4, atol=1e-5)


def test_image_tower_tp_params_actually_sharded():
    """r3: the Megatron column->row rules for MBConv land on the mesh — the
    expanded-dim leaves are sharded over 'model' at runtime and the step runs
    (numeric parity with other mesh layouts is covered by the fsdp/replica
    tests above, which run the same rules)."""
    import jax

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.core.mesh import MeshContext
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.parallel.partitioning import shard_train_state
    from mammo_clip_tpu.train import (
        build_optimizer, create_train_state, warmup_cosine_sq_schedule,
    )

    ctx = MeshContext.create(data=4, model=2)
    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    tx = build_optimizer(cfg.optimizer.to_dict(),
                         warmup_cosine_sq_schedule(cfg.optimizer.lr, 100, 10))
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    ids = rng.integers(1, cfg.model.text_encoder.vocab_size, size=(8, s), dtype=np.int32)
    batch = ctx.shard_host_batch({
        "images": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "input_ids": ids, "attention_mask": np.ones((8, s), np.int32),
    })
    base = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    st = shard_train_state(base, ctx.mesh)
    enc = st.params["image_encoder"]
    deep = sorted(k for k in enc if k.startswith("block_"))[-1]
    for leaf_name in ("depthwise_conv", "project_conv"):
        spec = enc[deep][leaf_name]["kernel"].sharding.spec
        assert "model" in str(spec), (deep, leaf_name, spec)
    # and the optimizer moments mirror the param sharding
    mus = [l for l in jax.tree_util.tree_leaves(st.opt_state)
           if hasattr(l, "sharding") and "model" in str(getattr(l.sharding, "spec", ""))]
    assert mus, "no optimizer moment followed the TP sharding"

    # structural eligibility gate (r3): e=1 blocks have NO expand_conv — no
    # Megatron column->row sandwich — so sharding their depthwise/BN would
    # force GSPMD to reshard the replicated block input every block (the
    # involuntary-rematerialization SPMD warning). They must stay replicated.
    e1_blocks = [k for k in enc if k.startswith("block_") and "expand_conv" not in enc[k]]
    assert e1_blocks, "tiny b0 should have e=1 blocks"
    for b in e1_blocks:
        spec = enc[b]["depthwise_conv"]["kernel"].sharding.spec
        assert "model" not in str(spec), (b, spec)


def test_global_batch_size_counts_only_batch_carrying_devices():
    """batch_sharding replicates the batch over 'model' (Megatron semantics),
    so global_batch_size must NOT multiply by the model axis — otherwise each
    data shard silently holds model_parallelism x the documented per-device
    batch (cli/pretrain.py sizes its Batcher with this)."""
    from mammo_clip_tpu.core.mesh import MeshContext

    ctx = MeshContext.create(data=4, model=2)
    assert ctx.num_devices == 8
    assert ctx.global_batch_size(3) == 12  # 3 per device x 4 data shards
    # and the sharded global batch divides evenly onto the mesh
    ctx_flat = MeshContext.create(data=8)
    assert ctx_flat.global_batch_size(3) == 24


def test_shard_seq_constraint_applies_under_mesh_context():
    """parallel/constraint.shard_seq: under an active mesh context the sequence
    dim of a (B, S, H) activation gets 'model'-sharded while the batch dim's
    existing 'data' sharding is preserved (UNCONSTRAINED dims); with no mesh
    context the helper is an exact no-op."""
    from mammo_clip_tpu.parallel import shard_seq

    mesh = make_mesh(data=4, model=2)
    x = jax.device_put(
        jnp.ones((8, 6, 4)), NamedSharding(mesh, P("data", None, None))
    )
    with jax.set_mesh(mesh):
        out = jax.jit(lambda t: shard_seq(t) * 1.0)(x)
    spec = out.sharding.spec
    assert spec[0] == "data" and spec[1] == "model", spec

    # no mesh context -> identity (trace-time no-op, single-device safe)
    y = jnp.ones((2, 6, 4))
    assert shard_seq(y) is y
    # indivisible sequence -> no-op even under the context
    with jax.set_mesh(mesh):
        z = jax.jit(lambda t: shard_seq(t) * 1.0)(jnp.ones((2, 5, 4)))
    assert "model" not in str(z.sharding.spec)


def test_seq_parallel_matches_replicated_loss():
    """text_encoder.seq_parallel=True (Megatron SP over the TP 'model' axis)
    computes the same train step as the baseline — the constraint only changes
    WHERE the LN/residual regions live, never the math."""
    import copy

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.core.mesh import MeshContext
    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.parallel.partitioning import shard_train_state
    from mammo_clip_tpu.train import (
        build_optimizer,
        create_train_state,
        make_train_step,
        warmup_cosine_sq_schedule,
    )

    ctx = MeshContext.create(data=4, model=2)
    cfg = tiny_test_config()
    base_model = build_model(cfg.model.to_dict())
    sp_cfg = copy.deepcopy(cfg.model.to_dict())
    sp_cfg["text_encoder"]["seq_parallel"] = True
    sp_model = build_model(sp_cfg)

    loss_fn = build_loss(cfg.loss.to_dict())
    tx = build_optimizer(cfg.optimizer.to_dict(),
                         warmup_cosine_sq_schedule(cfg.optimizer.lr, 100, 10))
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    assert s % 2 == 0, "tiny config S must divide the model axis for this test"
    v = cfg.model.text_encoder.vocab_size
    ids = rng.integers(1, v, size=(8, s), dtype=np.int32)
    batch = ctx.shard_host_batch({
        "images": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "image_views": rng.standard_normal((8, h, w, 1)).astype(np.float32),
        "input_ids": ids, "attention_mask": np.ones((8, s), np.int32),
        "input_ids2": ids, "attention_mask2": np.ones((8, s), np.int32),
    })
    base = create_train_state(base_model, batch, tx, jax.random.PRNGKey(0))
    state = shard_train_state(base, ctx.mesh)

    step = make_train_step(base_model, loss_fn, donate=False)
    sp_step = make_train_step(sp_model, loss_fn, donate=False)
    new_base, l_base = step(state, batch, jax.random.PRNGKey(1))
    with jax.set_mesh(ctx.mesh):
        new_sp, l_sp = sp_step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l_sp["total"]), float(l_base["total"]), rtol=2e-5)
    f_sp = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(new_sp.params)])
    f_base = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(new_base.params)])
    np.testing.assert_allclose(f_sp, f_base, rtol=5e-4, atol=1e-5)
