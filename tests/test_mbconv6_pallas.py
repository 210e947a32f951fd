"""Fused expanding-MBConv (e>1) Pallas kernel: numerics vs the unfused reference
and the Flax block, including the padded-rows/valid_h masking path.

Run in interpreter mode on the CPU mesh (TPU compilation is exercised by bench
runs on real hardware). Gradient checks cover every parameter and the input,
including the analytic bn0-through-expand statistics and their backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammo_clip_tpu.ops.mbconv6_pallas import (
    MBConv6Params,
    fused_mbconv_e6,
    mbconv_e6_reference,
)

N, C, H, W = 2, 8, 44, 12  # H=44 is NOT 8-divisible: exercises pad+mask (Hpad=48)
E = 4 * C  # expand ratio 4 (same code path as the production e=6)
SQ = max(1, C // 4)  # SE squeeze from the block's INPUT filters
HPAD, WPAD = 48, 16  # W padded too (production pads W to 128-lane multiples)


def _params(seed=0, c2=C):
    r = np.random.default_rng(seed)

    def f(*shape):
        return jnp.asarray(r.standard_normal(shape) * 0.5, jnp.float32)

    return MBConv6Params(
        we=f(C, E) * 0.5,
        gamma0=1.0 + 0.1 * f(E), beta0=0.1 * f(E),
        dw_kernel=f(E, 3, 3),
        gamma1=1.0 + 0.1 * f(E), beta1=0.1 * f(E),
        se_w1=f(E, SQ), se_b1=0.1 * f(SQ),
        se_w2=f(SQ, E), se_b2=0.1 * f(E),
        wp=f(E, c2) * 0.5,
        gamma2=1.0 + 0.1 * f(c2), beta2=0.1 * f(c2),
    )


def _inputs(seed=1):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((N, C, H, W)), jnp.float32)
    delta = jnp.asarray([1.25, 0.0], jnp.float32)  # kept (scaled) + dropped
    return x, delta


def _pad(x):
    return jnp.pad(x, ((0, 0), (0, 0), (0, HPAD - H), (0, WPAD - W)))


def test_reference_matches_flax_block():
    """The NCHW e>1 reference math == the Flax MBConvBlock in train mode."""
    from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

    x, _ = _inputs()
    delta_one = jnp.ones((N,), jnp.float32)
    p = _params()

    block = MBConvBlock(BlockArgs(kernel=3, stride=1, expand_ratio=4, in_filters=C,
                                  out_filters=C, se_ratio=0.25), drop_rate=0.0,
                        dtype=jnp.float32)
    x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
    variables = block.init({"params": jax.random.PRNGKey(0)}, x_nhwc, True)
    params = dict(variables["params"])
    params["expand_conv"] = {"kernel": p.we[None, None]}
    params["bn0"] = {"scale": p.gamma0, "bias": p.beta0}
    params["depthwise_conv"] = {"kernel": jnp.transpose(p.dw_kernel, (1, 2, 0))[:, :, None, :]}
    params["bn1"] = {"scale": p.gamma1, "bias": p.beta1}
    params["se"] = {
        "reduce": {"kernel": p.se_w1[None, None], "bias": p.se_b1},
        "expand": {"kernel": p.se_w2[None, None], "bias": p.se_b2},
    }
    params["project_conv"] = {"kernel": p.wp[None, None]}
    params["bn2"] = {"scale": p.gamma2, "bias": p.beta2}

    out_flax, _ = block.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x_nhwc, True, mutable=["batch_stats"],
    )
    out_ref, _ = mbconv_e6_reference(x, p, delta_one)
    np.testing.assert_allclose(np.asarray(out_flax),
                               np.transpose(np.asarray(out_ref), (0, 2, 3, 1)),
                               rtol=2e-5, atol=2e-5)


def test_fused_forward_matches_reference():
    x, delta = _inputs()
    p = _params()
    out_ref, stats_ref = mbconv_e6_reference(x, p, delta)
    out, stats = fused_mbconv_e6(_pad(x), p, delta, H, W, 1e-3, True)
    assert out.shape == (N, C, HPAD, WPAD)
    np.testing.assert_allclose(np.asarray(out[:, :, :H, :W]), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    # zero-pads-out contract (lets fused blocks chain without re-padding)
    assert float(jnp.abs(out[:, :, H:]).max()) == 0.0
    assert float(jnp.abs(out[:, :, :, W:]).max()) == 0.0
    for a, b in zip(stats, stats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_fused_forward_aligned_no_padding():
    """Exact-fit case: valid_h == Hpad (no masked rows)."""
    r = np.random.default_rng(5)
    x = jnp.asarray(r.standard_normal((N, C, 48, W)), jnp.float32)
    delta = jnp.ones((N,), jnp.float32)
    p = _params(2)
    out_ref, stats_ref = mbconv_e6_reference(x, p, delta)
    out, stats = fused_mbconv_e6(x, p, delta, 48, W, 1e-3, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5)
    for a, b in zip(stats, stats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_reference():
    x, delta = _inputs()
    p = _params()
    r = np.random.default_rng(3)
    w_out = jnp.asarray(r.standard_normal((N, C, H, W)), jnp.float32)

    def loss_fused(x, p):
        out, _ = fused_mbconv_e6(_pad(x), p, delta, H, W, 1e-3, True)
        return jnp.sum(out[:, :, :H, :W] * w_out)

    def loss_ref(x, p):
        out, _ = mbconv_e6_reference(x, p, delta)
        return jnp.sum(out * w_out)

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, p)
    (lr, gr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(float(lf), float(lr), rtol=3e-5)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    for name in MBConv6Params._fields:
        a, b = np.asarray(getattr(gf[1], name)), np.asarray(getattr(gr[1], name))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_projecting_block_cin_ne_cout():
    """Non-residual projecting variant (stage entry blocks, C_in != C_out)."""
    c2 = 6
    p = _params(4, c2=c2)
    x, delta = _inputs(6)
    r = np.random.default_rng(7)
    w_out = jnp.asarray(r.standard_normal((N, c2, H, W)), jnp.float32)

    out_ref, _ = mbconv_e6_reference(x, p, delta)
    out, _ = fused_mbconv_e6(_pad(x), p, delta, H, W, 1e-3, True)
    assert out.shape == (N, c2, HPAD, WPAD)
    np.testing.assert_allclose(np.asarray(out[:, :, :H, :W]), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        o, _ = fused_mbconv_e6(_pad(x), p, delta, H, W, 1e-3, True)
        return jnp.sum(o[:, :, :H, :W] * w_out)

    def loss_ref(x, p):
        o, _ = mbconv_e6_reference(x, p, delta)
        return jnp.sum(o * w_out)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    for name in MBConv6Params._fields:
        np.testing.assert_allclose(np.asarray(getattr(gf[1], name)),
                                   np.asarray(getattr(gr[1], name)),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_efficientnet_fused_e6_matches_flax():
    """Encoder-level routing of expanding blocks through the e6 kernel, with a
    height that forces the pad+mask path (input 88 -> stage-2 maps at H=22),
    matches the Flax path in forward, gradients, and running stats."""
    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.asarray(np.random.default_rng(9).standard_normal((2, 88, 48, 1)),
                    jnp.float32)
    kw = dict(variant="b0", in_channels=1, drop_connect_rate=0.0)
    m_ref = EfficientNet(**kw, fused_mbconv=False)
    m_fused = EfficientNet(**kw, fused_mbconv=True)
    v = jax.jit(lambda x: m_ref.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    v2 = jax.jit(lambda x: m_fused.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(variables, x, m):
        out, mut = m.apply(variables, x, True,
                           rngs={"stochastic": jax.random.PRNGKey(3)},
                           mutable=["batch_stats"])
        return jnp.sum(out["pooled"].astype(jnp.float32) ** 2), mut["batch_stats"]

    (l1, bs1), g1 = jax.jit(jax.value_and_grad(loss, has_aux=True),
                            static_argnums=2)(v, x, m_ref)
    (l2, bs2), g2 = jax.jit(jax.value_and_grad(loss, has_aux=True),
                            static_argnums=2)(v, x, m_fused)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    f1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g1)])
    f2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g2)])
    rel = float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1))
    assert rel < 1e-3, rel
    s1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(bs1)])
    s2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(bs2)])
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-4, atol=2e-5)


def test_fused_bf16_io():
    x, delta = _inputs()
    p = _params()
    out_ref, _ = mbconv_e6_reference(x, p, delta)
    out, _ = fused_mbconv_e6(_pad(x).astype(jnp.bfloat16), p, delta, H, W, 1e-3, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out[:, :, :H, :W], np.float32),
                               np.asarray(out_ref), rtol=0.1, atol=0.2)


def test_fused_bf16_gradients_smoke():
    """The bf16 compute path's full VJP runs and lands within bf16 tolerance of
    the fp32 reference (production trains with bf16 activations)."""
    x, delta = _inputs()
    p = _params()
    r = np.random.default_rng(3)
    w_out = jnp.asarray(r.standard_normal((N, C, H, W)), jnp.float32)

    def loss_fused16(x16, p):
        out, _ = fused_mbconv_e6(x16, p, delta, H, W, 1e-3, True)
        return jnp.sum(out[:, :, :H, :W].astype(jnp.float32) * w_out)

    def loss_ref(x, p):
        out, _ = mbconv_e6_reference(x, p, delta)
        return jnp.sum(out * w_out)

    gf = jax.grad(loss_fused16, argnums=(0, 1))(_pad(x).astype(jnp.bfloat16), p)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    dx16 = np.asarray(gf[0][:, :, :H, :W], np.float32)
    dxr = np.asarray(gr[0])
    rel = np.linalg.norm(dx16 - dxr) / np.linalg.norm(dxr)
    assert np.isfinite(rel) and rel < 0.08, rel
    # pad region of dx stays zero (upstream zero-pad contract)
    assert float(jnp.abs(gf[0][:, :, H:]).max()) == 0.0
    assert float(jnp.abs(gf[0][:, :, :, W:]).max()) == 0.0
    for name in MBConv6Params._fields:
        a = np.asarray(getattr(gf[1], name), np.float32)
        b = np.asarray(getattr(gr[1], name))
        reln = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
        assert np.isfinite(reln) and reln < 0.15, (name, reln)


def test_unified_kernel_e1_mode_matches_e1_reference():
    """MBConvParams routes through the same kernel in e=1 form (no expand/bn0):
    forward, stats, and every gradient match mbconv_e1_reference, with pad+mask
    (H and W both padded)."""
    from mammo_clip_tpu.ops.mbconv_pallas import MBConvParams, mbconv_e1_reference

    c = 8
    r = np.random.default_rng(11)

    def f(*shape):
        return jnp.asarray(r.standard_normal(shape) * 0.5, jnp.float32)

    sq = max(1, c // 4)
    p = MBConvParams(
        dw_kernel=f(c, 3, 3),
        gamma1=1.0 + 0.1 * f(c), beta1=0.1 * f(c),
        se_w1=f(c, sq), se_b1=0.1 * f(sq),
        se_w2=f(sq, c), se_b2=0.1 * f(c),
        wp=f(c, c),
        gamma2=1.0 + 0.1 * f(c), beta2=0.1 * f(c),
    )
    x = jnp.asarray(r.standard_normal((2, c, 44, 12)), jnp.float32)
    delta = jnp.asarray([1.25, 0.0], jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 4), (0, 4)))  # 48 x 16
    w_out = jnp.asarray(r.standard_normal((2, c, 44, 12)), jnp.float32)

    out_ref, stats_ref = mbconv_e1_reference(x, p, delta)
    out, stats = fused_mbconv_e6(xp, p, delta, 44, 12, 1e-3, True)
    assert len(stats) == 4
    np.testing.assert_allclose(np.asarray(out[:, :, :44, :12]),
                               np.asarray(out_ref), rtol=2e-5, atol=2e-5)
    assert float(jnp.abs(out[:, :, 44:]).max()) == 0.0
    assert float(jnp.abs(out[:, :, :, 12:]).max()) == 0.0
    for a, b in zip(stats, stats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def loss_fused(x, p):
        o, _ = fused_mbconv_e6(jnp.pad(x, ((0, 0), (0, 0), (0, 4), (0, 4))),
                               p, delta, 44, 12, 1e-3, True)
        return jnp.sum(o[:, :, :44, :12] * w_out)

    def loss_ref(x, p):
        o, _ = mbconv_e1_reference(x, p, delta)
        return jnp.sum(o * w_out)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    for name in MBConvParams._fields:
        np.testing.assert_allclose(np.asarray(getattr(gf[1], name)),
                                   np.asarray(getattr(gr[1], name)),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
