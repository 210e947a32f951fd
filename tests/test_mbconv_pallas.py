"""Fused MBConv Pallas kernel: numerics vs the unfused reference and the Flax block.

Run in interpreter mode on the CPU mesh (the kernel's TPU compilation is exercised
by bench runs on real hardware). Gradient checks cover every parameter and the
input, including the exact train-BN batch-statistics backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammo_clip_tpu.ops.mbconv_pallas import (
    MBConvParams,
    fused_mbconv_e1,
    mbconv_e1_reference,
)

N, C, H, W = 2, 8, 48, 12
SQ = max(1, C // 4)  # SE squeeze width at se_ratio 0.25 of in_filters


def _params(seed=0):
    r = np.random.default_rng(seed)

    def f(*shape):
        return jnp.asarray(r.standard_normal(shape) * 0.5, jnp.float32)

    return MBConvParams(
        dw_kernel=f(C, 3, 3),
        gamma1=1.0 + 0.1 * f(C), beta1=0.1 * f(C),
        se_w1=f(C, SQ), se_b1=0.1 * f(SQ),
        se_w2=f(SQ, C), se_b2=0.1 * f(C),
        wp=f(C, C),
        gamma2=1.0 + 0.1 * f(C), beta2=0.1 * f(C),
    )


def _inputs(seed=1):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((N, C, H, W)), jnp.float32)
    delta = jnp.asarray([1.25, 0.0], jnp.float32)  # drop-connect: kept (scaled) + dropped
    return x, delta


def test_reference_matches_flax_block():
    """The NCHW reference math == the Flax MBConvBlock (e=1, k3, s1, train mode)."""
    import flax.linen as nn

    from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

    x, _ = _inputs()
    delta_one = jnp.ones((N,), jnp.float32)  # flax block: no drop (rate 0)
    p = _params()

    block = MBConvBlock(BlockArgs(kernel=3, stride=1, expand_ratio=1, in_filters=C,
                                  out_filters=C, se_ratio=0.25), drop_rate=0.0,
                        dtype=jnp.float32)
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x_nhwc, True)
    params = variables["params"]
    # graft our raw params into the flax tree (flax depthwise kernel is HWIO (3,3,1,C))
    params = dict(params)
    params["depthwise_conv"] = {"kernel": jnp.transpose(p.dw_kernel, (1, 2, 0))[:, :, None, :]}
    params["bn1"] = {"scale": p.gamma1, "bias": p.beta1}
    params["se"] = {
        "reduce": {"kernel": p.se_w1[None, None], "bias": p.se_b1},
        "expand": {"kernel": p.se_w2[None, None], "bias": p.se_b2},
    }
    params["project_conv"] = {"kernel": p.wp[None, None]}
    params["bn2"] = {"scale": p.gamma2, "bias": p.beta2}

    out_flax, mut = block.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x_nhwc, True, mutable=["batch_stats"],
    )
    out_ref, (m1, v1, m2, v2) = mbconv_e1_reference(x, p, delta_one)
    np.testing.assert_allclose(np.asarray(out_flax), np.transpose(np.asarray(out_ref), (0, 2, 3, 1)),
                               rtol=2e-5, atol=2e-5)


def test_fused_forward_matches_reference():
    x, delta = _inputs()
    p = _params()
    out_ref, stats_ref = mbconv_e1_reference(x, p, delta)
    out, stats = fused_mbconv_e1(x, p, delta, 1e-3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5)
    for a, b in zip(stats, stats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_reference():
    x, delta = _inputs()
    p = _params()
    r = np.random.default_rng(3)
    w_out = jnp.asarray(r.standard_normal((N, C, H, W)), jnp.float32)

    def loss_fused(x, p):
        out, _ = fused_mbconv_e1(x, p, delta, 1e-3, True)
        return jnp.sum(out * w_out)

    def loss_ref(x, p):
        out, _ = mbconv_e1_reference(x, p, delta)
        return jnp.sum(out * w_out)

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, p)
    (lr, gr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    dx_f, dp_f = gf
    dx_r, dp_r = gr
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r), rtol=1e-4, atol=1e-4)
    for name in MBConvParams._fields:
        a, b = np.asarray(getattr(dp_f, name)), np.asarray(getattr(dp_r, name))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_bf16_io():
    """bf16 tensor I/O (the production dtype) stays within bf16 tolerance."""
    x, delta = _inputs()
    p = _params()
    out_ref, _ = mbconv_e1_reference(x, p, delta)
    out, _ = fused_mbconv_e1(x.astype(jnp.bfloat16), p, delta, 1e-3, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(out_ref),
                               rtol=0.1, atol=0.15)


def test_fused_projecting_block_cin_ne_cout():
    """The non-residual projecting variant (b5 stage-1 block 0: 48 -> 24, e=1)."""
    C1, C2 = 16, 8
    r = np.random.default_rng(4)

    def f(*shape):
        return jnp.asarray(r.standard_normal(shape) * 0.5, jnp.float32)

    sq = max(1, C1 // 4)
    p = MBConvParams(
        dw_kernel=f(C1, 3, 3),
        gamma1=1.0 + 0.1 * f(C1), beta1=0.1 * f(C1),
        se_w1=f(C1, sq), se_b1=0.1 * f(sq),
        se_w2=f(sq, C1), se_b2=0.1 * f(C1),
        wp=f(C1, C2),
        gamma2=1.0 + 0.1 * f(C2), beta2=0.1 * f(C2),
    )
    x = jnp.asarray(r.standard_normal((2, C1, 48, 12)), jnp.float32)
    delta = jnp.ones((2,), jnp.float32)
    w_out = jnp.asarray(r.standard_normal((2, C2, 48, 12)), jnp.float32)

    out_ref, stats_ref = mbconv_e1_reference(x, p, delta)
    out, stats = fused_mbconv_e1(x, p, delta, 1e-3, True)
    assert out.shape == (2, C2, 48, 12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        o, _ = fused_mbconv_e1(x, p, delta, 1e-3, True)
        return jnp.sum(o * w_out)

    def loss_ref(x, p):
        o, _ = mbconv_e1_reference(x, p, delta)
        return jnp.sum(o * w_out)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-4)
    for name in MBConvParams._fields:
        np.testing.assert_allclose(np.asarray(getattr(gf[1], name)),
                                   np.asarray(getattr(gr[1], name)),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_efficientnet_fused_mbconv_matches_flax():
    """fused_mbconv routing: same params, same forward/grads as the Flax path."""
    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 64, 48, 1)), jnp.float32)
    kw = dict(variant="b0", in_channels=1, drop_connect_rate=0.0)
    m_ref = EfficientNet(**kw, fused_mbconv=False)
    m_fused = EfficientNet(**kw, fused_mbconv=True)
    v = jax.jit(lambda x: m_ref.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    v2 = jax.jit(lambda x: m_fused.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(variables, x, m):
        out, mut = m.apply(variables, x, True, rngs={"stochastic": jax.random.PRNGKey(3)},
                           mutable=["batch_stats"])
        return jnp.sum(out["pooled"].astype(jnp.float32) ** 2), mut["batch_stats"]

    (l1, bs1), g1 = jax.jit(jax.value_and_grad(loss, has_aux=True), static_argnums=2)(v, x, m_ref)
    (l2, bs2), g2 = jax.jit(jax.value_and_grad(loss, has_aux=True), static_argnums=2)(v, x, m_fused)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g1)])
    f2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g2)])
    rel = float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1))
    assert rel < 1e-3, rel
    # running stats updated identically (same batch stats, same momentum)
    s1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(bs1)])
    s2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(bs2)])
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-4, atol=2e-5)

    # eval: fused path falls back to the Flax path — identical outputs
    o1 = jax.jit(lambda v, x: m_ref.apply(v, x, False))(v, x)
    o2 = jax.jit(lambda v, x: m_fused.apply(v, x, False))(v, x)
    np.testing.assert_allclose(np.asarray(o1["pooled"]), np.asarray(o2["pooled"]),
                               rtol=1e-5, atol=1e-6)
