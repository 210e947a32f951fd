"""Exact space-to-depth execution (ops/s2d_exec.py): the SAME network function
with the SAME parameters, executed 4x lane-denser. Checked against the standard
Flax path for forward, gradients, and running statistics."""

import jax
import jax.numpy as jnp
import numpy as np

from mammo_clip_tpu.ops.s2d_exec import (
    depth_to_space,
    dw_kernel_s2d,
    dw_kernel_s2d_stride2,
    grouped_dw_s2d,
    phase_mix_1x1,
    space_to_depth,
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 12, 5)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_s2d_depthwise_stride1_exact():
    """grouped base conv == the original SAME depthwise 3x3 stride 1."""
    r = np.random.default_rng(1)
    c = 6
    x = jnp.asarray(r.standard_normal((2, 12, 16, c)), jnp.float32)
    k = jnp.asarray(r.standard_normal((3, 3, 1, c)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    out = depth_to_space(grouped_dw_s2d(space_to_depth(x), dw_kernel_s2d(k),
                                        stride1=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_depthwise_stride2_exact():
    """stride-2 case: output at base resolution, TF-SAME (0,1) padding."""
    r = np.random.default_rng(2)
    c = 6
    x = jnp.asarray(r.standard_normal((2, 12, 16, c)), jnp.float32)
    k = jnp.asarray(r.standard_normal((3, 3, 1, c)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    k2, pad = dw_kernel_s2d_stride2(k)
    out = grouped_dw_s2d(space_to_depth(x), k2, stride1=False, pad=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_1x1_exact():
    r = np.random.default_rng(3)
    x = jnp.asarray(r.standard_normal((2, 8, 12, 5)), jnp.float32)
    w = jnp.asarray(r.standard_normal((5, 7)), jnp.float32)
    ref = jnp.einsum("nhwc,cd->nhwd", x, w)
    out = depth_to_space(phase_mix_1x1(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_efficientnet_s2d_exec_matches_standard():
    """Encoder-level: s2d_exec=True is the same function as the standard path —
    forward, gradients, and batch_stats updates agree to float round-off.
    b0 @ 64x48 covers: e=1 stride-1 (stage 1), e=6 stride-2 entry (consumes the
    layout), e=6 stride-1 re-entry (stage 2), and the k5 exit (stage 3+)."""
    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 64, 48, 1)),
                    jnp.float32)
    kw = dict(variant="b0", in_channels=1, drop_connect_rate=0.0)
    m_ref = EfficientNet(**kw)
    m_s2d = EfficientNet(**kw, s2d_exec=True)
    v = jax.jit(lambda x: m_ref.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    v2 = jax.jit(lambda x: m_s2d.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(variables, x, m):
        out, mut = m.apply(variables, x, True,
                           rngs={"stochastic": jax.random.PRNGKey(3)},
                           mutable=["batch_stats"])
        return jnp.sum(out["pooled"].astype(jnp.float32) ** 2), mut["batch_stats"]

    (l1, bs1), g1 = jax.jit(jax.value_and_grad(loss, has_aux=True),
                            static_argnums=2)(v, x, m_ref)
    (l2, bs2), g2 = jax.jit(jax.value_and_grad(loss, has_aux=True),
                            static_argnums=2)(v, x, m_s2d)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g1)])
    f2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g2)])
    rel = float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1))
    assert rel < 1e-4, rel
    s1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(bs1)])
    s2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(bs2)])
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4,
                               atol=1e-6)

    # eval (running stats) agrees too
    o1 = jax.jit(lambda v, x: m_ref.apply(v, x, False))(v, x)
    o2 = jax.jit(lambda v, x: m_s2d.apply(v, x, False))(v, x)
    np.testing.assert_allclose(np.asarray(o1["pooled"]), np.asarray(o2["pooled"]),
                               rtol=1e-5, atol=1e-6)


def test_s2d_depthwise_k5_exact():
    """k=5 stride-1 and stride-2 cases (stages 3/5/6 kernels)."""
    r = np.random.default_rng(4)
    c = 5
    x = jnp.asarray(r.standard_normal((2, 12, 16, c)), jnp.float32)
    k = jnp.asarray(r.standard_normal((5, 5, 1, c)), jnp.float32)
    ref1 = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    out1 = depth_to_space(grouped_dw_s2d(space_to_depth(x), dw_kernel_s2d(k),
                                         stride1=True))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-5)
    ref2 = jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    k2, pad = dw_kernel_s2d_stride2(k)
    out2 = grouped_dw_s2d(space_to_depth(x), k2, stride1=False, pad=pad)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
