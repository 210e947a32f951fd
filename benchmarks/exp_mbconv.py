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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("MAMMO_CLIP_JAX_CACHE", "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mammo_clip_tpu.ops.mbconv_pallas import (
        MBConvParams,
        fused_mbconv_e1,
        mbconv_e1_reference,
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

    def loss_fused(x, p):
        out, _ = fused_mbconv_e1(x, p, delta, 1e-3, False)
        return jnp.sum((out * w_out).astype(jnp.float32))

    def loss_ref(x, p):
        out, _ = mbconv_e1_reference(x, p, delta)
        return jnp.sum((out.astype(jnp.bfloat16) * w_out).astype(jnp.float32))

    result = {"views": N, "c": C, "h": H, "w": W}

    def bench(name, fn):
        g = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
        t0 = time.perf_counter()
        (l, (dx, dp)) = g(x, p)
        l0 = float(l)
        result[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            (l, (dx, dp)) = g(x, p)
            _ = float(l)
            times.append(time.perf_counter() - t0)
        result[f"{name}_ms"] = round(sorted(times)[len(times) // 2] * 1e3, 2)
        result[f"{name}_loss"] = l0
        return dx, dp

    dx_f, dp_f = bench("fused", loss_fused)
    if not args.fused_only:
        dx_r, dp_r = bench("ref", loss_ref)
        rel = float(jnp.linalg.norm((dx_f - dx_r).astype(jnp.float32)) /
                    jnp.linalg.norm(dx_r.astype(jnp.float32)))
        result["dx_rel_l2"] = round(rel, 6)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
