"""Standalone TPU microbench: fused Pallas MBConv vs the unfused XLA reference.

Runs the e=1 block at the B5 stage-1 production shape (C=24, 456x760) fwd+bwd.
Usage: python benchmarks/exp_mbconv.py [--views 16] [--c 24] [--h 456] [--w 760]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--c", type=int, default=24)
    ap.add_argument("--h", type=int, default=456)
    ap.add_argument("--w", type=int, default=760)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--fused-only", action="store_true")
    ap.add_argument("--nhwc", action="store_true",
                    help="also bench the production Flax NHWC bf16 block")
    ap.add_argument("--ref-bf16", action="store_true",
                    help="also bench the unfused NCHW reference with bf16 conv I/O")
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from mammo_clip_tpu.ops.mbconv_pallas import (
        MBConvParams,
        mbconv_e1_reference,
    )
    from mammo_clip_tpu.ops.mbconv6_pallas import (
        fused_mbconv_e6,
        pick_h_pad,
        pick_w_pad,
    )

    N, C, H, W = args.views, args.c, args.h, args.w
    r = np.random.default_rng(0)

    def f(*shape):
        return jnp.asarray(r.standard_normal(shape) * 0.1, jnp.float32)

    sq = max(1, C // 4)
    p = MBConvParams(
        dw_kernel=f(C, 3, 3), gamma1=1.0 + 0.1 * f(C), beta1=0.1 * f(C),
        se_w1=f(C, sq), se_b1=0.1 * f(sq), se_w2=f(sq, C), se_b2=0.1 * f(C),
        wp=f(C, C), gamma2=1.0 + 0.1 * f(C), beta2=0.1 * f(C),
    )
    x = jnp.asarray(r.standard_normal((N, C, H, W)), jnp.bfloat16)
    delta = jnp.ones((N,), jnp.float32)
    w_out = jnp.asarray(r.standard_normal((N, C, H, W)) * 0.01, jnp.bfloat16)

    WP = pick_w_pad(W)
    HP = pick_h_pad(H, C, WP)

    def loss_fused(x, p, w_out=w_out):
        # unified masked kernel (e=1 form): pad to the lane/tile alignment it
        # requires, slice the valid region back for the loss
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, HP - H), (0, WP - W)))
        out, _ = fused_mbconv_e6(xp, p, delta, H, W, 1e-3, False)
        return jnp.sum((out[:, :, :H, :W] * w_out).astype(jnp.float32))

    def loss_ref(x, p, w_out=w_out):
        out, _ = mbconv_e1_reference(x, p, delta)
        return jnp.sum((out.astype(jnp.bfloat16) * w_out).astype(jnp.float32))

    result = {"views": N, "c": C, "h": H, "w": W}

    GROUP = 5  # dispatches per scalar fetch: amortizes the ~30 ms relay sync
    #            (single-step fetch timing overreports by that constant)

    def bench(name, fn):
        g = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
        t0 = time.perf_counter()
        (l, (dx, dp)) = g(x, p)
        l0 = float(l)
        result[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        times = []
        for _ in range(max(1, args.steps // GROUP) + 1):
            t0 = time.perf_counter()
            for _ in range(GROUP):
                (l, (dx, dp)) = g(x, p)
            _ = float(l)
            times.append((time.perf_counter() - t0) / GROUP)
        result[f"{name}_ms"] = round(sorted(times)[len(times) // 2] * 1e3, 2)
        result[f"{name}_loss"] = l0
        return dx, dp

    dx_f = dx_r = None
    if not args.skip_fused:
        dx_f, dp_f = bench("fused", loss_fused)
    if not args.fused_only and not args.skip_ref:
        dx_r, dp_r = bench("ref", loss_ref)
    if args.ref_bf16:
        import jax.numpy as _jnp
        from mammo_clip_tpu.ops.mbconv_pallas import _se_gate, _silu

        def loss_ref16(x, p):
            # same math as mbconv_e1_reference but bf16 conv I/O (fp32 stats/accum)
            k = p.dw_kernel.astype(_jnp.bfloat16)
            d = jax.lax.conv_general_dilated(
                x, k[:, None].transpose(2, 3, 1, 0), (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                feature_group_count=x.shape[1],
            ).astype(_jnp.float32)
            mean1 = _jnp.mean(d, axis=(0, 2, 3))
            var1 = _jnp.maximum(_jnp.mean(d * d, axis=(0, 2, 3)) - mean1 ** 2, 0.0)
            dh = (d - mean1[:, None, None]) * jax.lax.rsqrt(var1 + 1e-3)[:, None, None]
            dh = dh * p.gamma1[:, None, None] + p.beta1[:, None, None]
            v = _silu(dh)
            s = _jnp.mean(v, axis=(2, 3))
            gate, _ = _se_gate(s, p)
            u = (v * gate[:, :, None, None]).astype(_jnp.bfloat16)
            y = _jnp.einsum("nchw,cd->ndhw", u,
                            p.wp.astype(_jnp.bfloat16)).astype(_jnp.float32)
            mean2 = _jnp.mean(y, axis=(0, 2, 3))
            var2 = _jnp.maximum(_jnp.mean(y * y, axis=(0, 2, 3)) - mean2 ** 2, 0.0)
            yh = (y - mean2[:, None, None]) * jax.lax.rsqrt(var2 + 1e-3)[:, None, None]
            yh = yh * p.gamma2[:, None, None] + p.beta2[:, None, None]
            out = (delta[:, None, None, None] * yh).astype(_jnp.bfloat16) + x
            return _jnp.sum((out * w_out).astype(_jnp.float32))

        bench("ref16", loss_ref16)

    if dx_f is not None and dx_r is not None:
        rel = float(jnp.linalg.norm((dx_f - dx_r).astype(jnp.float32)) /
                    jnp.linalg.norm(dx_r.astype(jnp.float32)))
        result["dx_rel_l2"] = round(rel, 6)

    if args.nhwc:
        # production path: Flax MBConvBlock, NHWC bf16 activations, train-mode BN
        from flax.core import freeze
        from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

        a = BlockArgs(kernel=3, stride=1, expand_ratio=1, in_filters=C,
                      out_filters=C, se_ratio=0.25)
        block = MBConvBlock(a, drop_rate=0.0, dtype=jnp.bfloat16)
        x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
        w_nhwc = jnp.transpose(w_out, (0, 2, 3, 1))
        variables = block.init({"params": jax.random.PRNGKey(0)}, x_nhwc, True)

        def loss_nhwc(x_, params):
            out, _ = block.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x_, True, mutable=["batch_stats"],
            )
            return jnp.sum((out * w_nhwc).astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(loss_nhwc, argnums=(0, 1)))
        t0 = time.perf_counter()
        l, _ = g(x_nhwc, variables["params"])
        l0 = float(l)
        result["nhwc_compile_s"] = round(time.perf_counter() - t0, 1)
        times = []
        for _ in range(max(1, args.steps // GROUP) + 1):
            t0 = time.perf_counter()
            for _ in range(GROUP):
                l, grads = g(x_nhwc, variables["params"])
            _ = float(l)
            times.append((time.perf_counter() - t0) / GROUP)
        result["nhwc_ms"] = round(sorted(times)[len(times) // 2] * 1e3, 2)
        result["nhwc_loss"] = l0
    print(json.dumps(result))


if __name__ == "__main__":
    main()
