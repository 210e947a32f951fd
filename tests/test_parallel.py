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
    assert spec_for_path("image_encoder/block_5/depthwise_conv/kernel") == P()
    assert spec_for_path("logit_scale") == P()
