"""Exact space-to-depth EXECUTION of MBConv blocks (checkpoint-compatible).

BASELINE.md's round-2 profile shows the step is HBM-bound with 58% of the time
in stages 1-2, whose narrow channels (C=24..48) pad to 128 bf16 lanes — up to
5.3x dead bytes on every tensor XLA materializes (and XLA materializes padded
conv layouts whatever the logical layout: NHWC/NCHW measured within 10%).

This module re-executes those blocks over a space-to-depth(2) layout —
(N, H, W, C) -> (N, H/2, W/2, 4C), channel-major [c, phase] — where the lane
dim is 4x denser, so the same mathematical network moves ~4x fewer padded
bytes. Unlike the opt-in ``tpu_optimized`` variant (which REPLACES the front
end and trains from scratch), this is the SAME function with the SAME
parameters, checkpoint-compatible with the reference:

* depthwise 3x3 stride 1  ==  grouped base conv, kernel (3,3,4,4C), groups=C:
  output phase (pr,pc) of channel c taps input phases at base offsets in
  {-1,0,1}; each original tap K[a,b,c] lands at exactly one
  (base offset, input phase) slot — the rest of the 3x3x4 sub-kernel is zero.
* depthwise 3x3 stride 2  ==  grouped base conv, kernel (2,2,4,C), groups=C,
  padding ((0,1),(0,1)) (TF-SAME for even dims at stride 2), output at base
  resolution — a stride-2 block naturally EXITS the s2d layout.
* 1x1 convs (expand/project)  ==  per-phase channel mixing:
  einsum over the channel factor of the (..., C, 4) view. Exact.
* BatchNorm / SqueezeExcite statistics over (N, H, W) of an original channel
  == statistics over (N, H/2, W/2, 4 phases) of its channel group. Exact.
* silu / gating / drop-connect / residual: elementwise. Exact.

Replaces the layout of the reference hot path (breastclip/model/modules/
efficientnet_custom.py MBConvBlock.forward) with no semantic change; numerics
match the standard path to float round-off (tests/test_s2d_exec.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel-major ([c, pr, pc] minor)."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (N, H', W', C, 2, 2)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    n, hp, wp, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, hp, wp, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (N, H', 2, W', 2, C)
    return x.reshape(n, 2 * hp, 2 * wp, c)


def dw_kernel_s2d(k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise HWIO (3,3,1,C) -> the grouped base-conv kernel (3,3,4,4C)
    (stride-1 case; groups=C, SAME pad 1 at base resolution).

    Built by scattering each original tap into its (base offset, input phase,
    output phase) slot; the scatter pattern is static so it lowers to a
    constant-index add at trace time."""
    c = k.shape[-1]
    out = jnp.zeros((3, 3, 4, 4 * c), k.dtype)
    for pr in range(2):
        for pc in range(2):
            for a in range(3):
                for b in range(3):
                    qr, ir = divmod(pr + a - 1, 2)
                    qc, ic = divmod(pc + b - 1, 2)
                    out = out.at[qr + 1, qc + 1, ir * 2 + ic,
                                 jnp.arange(c) * 4 + pr * 2 + pc].add(
                        k[a, b, 0, :])
    return out


def dw_kernel_s2d_stride2(k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise HWIO (3,3,1,C) -> grouped base-conv kernel (2,2,4,C) for the
    stride-2 case (padding ((0,1),(0,1)); output leaves the s2d layout)."""
    c = k.shape[-1]
    out = jnp.zeros((2, 2, 4, c), k.dtype)
    for a in range(3):
        for b in range(3):
            qr, ir = divmod(a, 2)   # input row 2R + a: base R+qr, phase ir
            qc, ic = divmod(b, 2)
            out = out.at[qr, qc, ir * 2 + ic, :].add(k[a, b, 0, :])
    return out


def phase_mix_1x1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-phase 1x1 conv on the s2d tensor: x (..., 4*Cin) [c-major],
    w (Cin, Cout) -> (..., 4*Cout). Exactly the original 1x1 conv."""
    n, hp, wp, c4 = x.shape
    cin = c4 // 4
    t = x.reshape(n, hp, wp, cin, 4)
    y = jnp.einsum("nhwcp,cd->nhwdp", t, w)
    return y.reshape(n, hp, wp, -1)


def phase_stats(x: jnp.ndarray, batch: bool = True):
    """Mean/var per ORIGINAL channel: reduce over space and the 4 phases
    (and batch when ``batch``). x (..., 4C) c-major -> ((C,), (C,))."""
    n, hp, wp, c4 = x.shape
    t = x.reshape(n, hp, wp, c4 // 4, 4).astype(jnp.float32)
    axes = (0, 1, 2, 4) if batch else (1, 2, 4)
    mean = jnp.mean(t, axis=axes)
    var = jnp.mean(jnp.square(t), axis=axes) - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def phase_broadcast(v: jnp.ndarray) -> jnp.ndarray:
    """(C,) per-original-channel vector -> (4C,) c-major phase layout."""
    return jnp.repeat(v, 4)


def phase_spatial_mean(x: jnp.ndarray) -> jnp.ndarray:
    """SE squeeze: per-image per-original-channel spatial mean. -> (N, C)."""
    n, hp, wp, c4 = x.shape
    t = x.reshape(n, hp, wp, c4 // 4, 4)
    return jnp.mean(t.astype(jnp.float32), axis=(1, 2, 4))


def grouped_dw_s2d(x: jnp.ndarray, k_s2d: jnp.ndarray, stride1: bool) -> jnp.ndarray:
    """Apply the transformed depthwise kernel on the s2d tensor.

    stride1: kernel (3,3,4,4C), SAME pad 1, output stays s2d (..., 4C).
    stride2: kernel (2,2,4,C), pad ((0,1),(0,1)), output at base resolution
    (..., C) — the s2d layout is consumed."""
    c4 = x.shape[-1]
    groups = c4 // 4
    if stride1:
        return jax.lax.conv_general_dilated(
            x, k_s2d, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    return jax.lax.conv_general_dilated(
        x, k_s2d, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
