"""int8 MXU quantization experiment (ops/quant.py; VERDICT r2 #5).

Gates: forward numerics bound, exact straight-through gradients, param-tree
compatibility of the quantized MBConv path, and a small learning-parity run
(the 'numerics bound as loss-curve overlay' the verdict asks for)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mammo_clip_tpu.ops.quant import int8_conv1x1, int8_dot


def test_int8_dot_forward_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    ref = x @ w
    q = int8_dot(x, w, jnp.float32)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    # per-tensor act + per-channel weight int8: ~0.5% relative on normal data
    assert rel < 0.02, rel


def test_int8_dot_straight_through_grads_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)

    def f_q(x, w):
        return jnp.sum(int8_dot(x, w, jnp.float32) * g)

    def f_ref(x, w):
        return jnp.sum((x @ w) * g)

    gx_q, gw_q = jax.grad(f_q, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    # straight-through: bwd uses the UNQUANTIZED operands; tolerance is the
    # bf16 rounding of the backward matmuls (fp32 accumulation), ~0.4%/element
    np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_r), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_r), rtol=2e-2, atol=3e-2)


def test_int8_conv1x1_matches_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 64, 32)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = int8_conv1x1(x, k, jnp.float32)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_quant_block_param_tree_and_forward():
    """quant_int8 MBConv declares the SAME param tree as the standard block
    (checkpoint-identical) and stays numerically close in forward."""
    from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

    a = BlockArgs(kernel=5, stride=1, expand_ratio=6, in_filters=32,
                  out_filters=32, se_ratio=0.25)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)
    std = MBConvBlock(a, drop_rate=0.0)
    qnt = MBConvBlock(a, drop_rate=0.0, quant_int8=True)
    v = std.init({"params": jax.random.PRNGKey(0)}, x, False)
    vq = qnt.init({"params": jax.random.PRNGKey(0)}, x, False)
    t1 = jax.tree_util.tree_structure(v)
    t2 = jax.tree_util.tree_structure(vq)
    assert t1 == t2
    for p1, p2 in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vq)):
        assert p1.shape == p2.shape
    o_std = std.apply(v, x, False)
    o_q = qnt.apply(v, x, False)  # SAME params through the quantized path
    rel = float(jnp.linalg.norm(o_q - o_std) / jnp.linalg.norm(o_std))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_int8_deep_stages_learning_parity():
    """Loss-curve overlay: a tiny conv net with int8 1x1s trains to the same
    ballpark loss as the fp path on a separable synthetic task."""
    from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

    a = BlockArgs(kernel=5, stride=1, expand_ratio=4, in_filters=16,
                  out_filters=16, se_ratio=0.25)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(32, 8, 8, 16)), jnp.float32)
    y = jnp.asarray((rng.normal(size=(32,)) > 0).astype(np.float32))
    # make labels depend on the input
    y = (jnp.mean(x[:, :, :, 0], axis=(1, 2)) > 0).astype(jnp.float32)

    def curve(quant):
        block = MBConvBlock(a, drop_rate=0.0, quant_int8=quant)
        v = block.init({"params": jax.random.PRNGKey(0)}, x, False)
        head_w = jnp.zeros((16,), jnp.float32)
        params = {"block": v["params"], "head": head_w}
        tx = optax.adam(3e-3)
        opt = tx.init(params)
        bs = v["batch_stats"]

        def loss_fn(params, bs):
            out, upd = block.apply(
                {"params": params["block"], "batch_stats": bs},
                x, True, mutable=["batch_stats"],
                rngs={"stochastic": jax.random.PRNGKey(1)})
            logit = jnp.mean(out, axis=(1, 2)) @ params["head"]
            l = optax.sigmoid_binary_cross_entropy(logit, y).mean()
            return l, upd["batch_stats"]

        losses = []
        step = jax.jit(lambda p, o, b: _step(p, o, b))

        def _step(params, opt, bs):
            (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params, bs)
            updates, opt = tx.update(g, opt)
            return optax.apply_updates(params, updates), opt, bs, l

        for _ in range(60):
            params, opt, bs, l = step(params, opt, bs)
            losses.append(float(l))
        return losses

    fp = curve(False)
    q8 = curve(True)
    assert fp[-1] < 0.25, fp[-1]
    assert q8[-1] < fp[-1] + 0.1, (fp[-1], q8[-1])
