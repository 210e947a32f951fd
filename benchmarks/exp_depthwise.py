"""Depthwise-conv microbenchmark: is the k5 depthwise VPU-compute-bound?

The r3 flagship profile shows stage3 (k5, E=384 @ 190x114) running at ~60% of
its HBM roofline while the k3 front runs AT its roofline — hypothesis: the k5
depthwise's 25 MAC/px/ch lands on the VPU and its compute time exceeds the
tensor's byte time. If true, k5->k3 in the from-scratch flagship stages is a
~2.8x FLOP cut on the depthwise at identical byte traffic (receptive-field /
quality tradeoff gated by tests/test_clip_learns.py).

Usage: python benchmarks/exp_depthwise.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    r = np.random.default_rng(0)
    # (label, N, H, W, C, k): flagship stage shapes (16 views)
    cases = [
        ("front  380x228 C128 k3", 16, 380, 228, 128, 3),
        ("stage3 190x114 E384 k3", 16, 190, 114, 384, 3),
        ("stage3 190x114 E384 k5", 16, 190, 114, 384, 5),
        ("stage5  95x57 E1152 k3", 16, 95, 57, 1152, 3),
        ("stage5  95x57 E1152 k5", 16, 95, 57, 1152, 5),
        ("stage6  48x29 E1920 k5", 16, 48, 29, 1920, 5),
    ]
    out = {}
    for label, n, h, w, c, k in cases:
        x = jnp.asarray(r.standard_normal((n, h, w, c)), jnp.bfloat16)
        kern = jnp.asarray(r.standard_normal((k, k, 1, c)) * 0.1, jnp.bfloat16)

        def f(x, kern):
            return jax.lax.conv_general_dilated(
                x, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        g = jax.jit(f)
        y = g(x, kern)
        _ = float(jnp.sum(y.astype(jnp.float32)))  # true sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                y = g(x, kern)
            _ = float(jnp.sum(y.astype(jnp.float32)))
            times.append((time.perf_counter() - t0) / 10)
        ms = sorted(times)[1] * 1e3
        bytes_gb = 2 * n * h * w * c * 2 / 2**30
        flops = n * h * w * c * k * k * 2
        out[label] = {"ms": round(ms, 2),
                      "eff_GiBps": round(bytes_gb / (ms / 1e3), 0),
                      "gflops": round(flops / 1e9, 1),
                      "tflops_rate": round(flops / (ms / 1e3) / 1e12, 2)}
        print(label, out[label], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
