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
    """Depthwise HWIO (kk,kk,1,C), kk in {3,5} -> the grouped base-conv kernel
    (3,3,4,4C) (stride-1 case; groups=C, SAME pad 1 at base resolution —
    a kk<=5 window spans at most 3 base pixels whatever the output phase).

    Built by scattering each original tap into its (base offset, input phase,
    output phase) slot; the scatter pattern is static so it lowers to a
    constant-index add at trace time."""
    kk, c = k.shape[0], k.shape[-1]
    assert kk in (3, 5), kk
    off = (kk - 1) // 2
    out = jnp.zeros((3, 3, 4, 4 * c), k.dtype)
    for pr in range(2):
        for pc in range(2):
            for a in range(kk):
                for b in range(kk):
                    qr, ir = divmod(pr + a - off, 2)
                    qc, ic = divmod(pc + b - off, 2)
                    out = out.at[qr + 1, qc + 1, ir * 2 + ic,
                                 jnp.arange(c) * 4 + pr * 2 + pc].add(
                        k[a, b, 0, :])
    return out


def dw_kernel_s2d_stride2(k: jnp.ndarray):
    """Depthwise HWIO (kk,kk,1,C), kk in {3,5} -> (kernel, padding) of the
    grouped base conv for the stride-2 case (output leaves the s2d layout).

    TF-SAME at stride 2 on even dims pads (0,1) for kk=3 and (1,2) for kk=5;
    in base coordinates that is a (2,2) kernel with ((0,1),(0,1)) padding and
    a (3,3) kernel with ((1,1),(1,1)) padding respectively."""
    kk, c = k.shape[0], k.shape[-1]
    assert kk in (3, 5), kk
    pad_top = 0 if kk == 3 else 1
    kb = 2 if kk == 3 else 3
    out = jnp.zeros((kb, kb, 4, c), k.dtype)
    for a in range(kk):
        for b in range(kk):
            qr, ir = divmod(a - pad_top, 2)  # input row 2R + a - pad_top
            qc, ic = divmod(b - pad_top, 2)
            q0 = 0 if kk == 3 else 1
            out = out.at[qr + q0, qc + q0, ir * 2 + ic, :].add(k[a, b, 0, :])
    pad = ((0, 1), (0, 1)) if kk == 3 else ((1, 1), (1, 1))
    return out, pad


def phase_mix_1x1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-phase 1x1 conv on the s2d tensor: x (..., 4*Cin) [c-major],
    w (Cin, Cout) -> (..., 4*Cout). Exactly the original 1x1 conv.

    Implemented as ONE dense (4Cin, 4Cout) matmul with a block-diagonal
    (kron with I4) weight: a rank-5 phase-split view makes XLA pick
    catastrophic layouts for the big intermediate (observed: batch dim in
    lanes -> 16x padded HBM allocation); the kron zeros only cost MXU FLOPs."""
    wb = jnp.einsum("cd,pq->cpdq", w, jnp.eye(4, dtype=w.dtype))
    wb = wb.reshape(w.shape[0] * 4, w.shape[1] * 4)
    return jnp.einsum("nhwk,kl->nhwl", x, wb)


def phase_stats(x: jnp.ndarray, batch: bool = True):
    """Mean/var per ORIGINAL channel: reduce over space and the 4 phases
    (and batch when ``batch``). x (..., 4C) c-major -> ((C,), (C,)).

    The big tensor is reduced at rank 4 (over N,H,W) FIRST; the tiny phase
    fold happens on the (4C,) vectors (rank-5 views of the full tensor are
    layout hazards — see phase_mix_1x1)."""
    assert batch
    xf = x.astype(jnp.float32)
    c4 = x.shape[-1]
    cnt = x.shape[0] * x.shape[1] * x.shape[2] * 4
    s1 = jnp.sum(xf, axis=(0, 1, 2)).reshape(c4 // 4, 4).sum(-1)
    s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2)).reshape(c4 // 4, 4).sum(-1)
    mean = s1 / cnt
    var = s2 / cnt - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def phase_broadcast(v: jnp.ndarray) -> jnp.ndarray:
    """(C,) per-original-channel vector -> (4C,) c-major phase layout."""
    return jnp.repeat(v, 4)


def phase_spatial_mean(x: jnp.ndarray) -> jnp.ndarray:
    """SE squeeze: per-image per-original-channel spatial mean. -> (N, C)."""
    n, hp, wp, c4 = x.shape
    s = jnp.sum(x.astype(jnp.float32), axis=(1, 2))  # (N, 4C), rank-4 reduce
    return s.reshape(n, c4 // 4, 4).sum(-1) / (hp * wp * 4)


def grouped_dw_s2d(x: jnp.ndarray, k_s2d: jnp.ndarray, stride1: bool,
                   pad=None) -> jnp.ndarray:
    """Apply the transformed depthwise kernel on the s2d tensor.

    stride1: kernel (3,3,4,4C), SAME pad 1, output stays s2d (..., 4C).
    stride2: kernel (kb,kb,4,C) with the padding returned by
    dw_kernel_s2d_stride2, output at base resolution (..., C) — the s2d
    layout is consumed."""
    c4 = x.shape[-1]
    groups = c4 // 4
    if stride1:
        pad = ((1, 1), (1, 1))
    return jax.lax.conv_general_dilated(
        x, k_s2d, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def dw_kernel_s2d_dense(k: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 depthwise as a DENSE (3,3,4C,4C) base conv with structured
    zeros (the grouped form embedded on the block diagonal).

    XLA's grouped-conv lowering for in_per_group=4 creates a rank-5 reshape
    whose layout puts a singleton in lanes (observed: 128x-padded 25 GB
    allocation). A dense conv takes the standard, well-laid-out path; the
    zero taps cost only MXU FLOPs, affordable while 4C <= ~128 (the e=1
    stage-1 blocks — exactly the narrow ones s2d is for)."""
    g = dw_kernel_s2d(k)  # (3,3,4,4C)
    c4 = g.shape[-1]
    dense = jnp.zeros((3, 3, c4, c4), k.dtype)
    for p_in in range(4):
        for c in range(c4 // 4):
            dense = dense.at[:, :, 4 * c + p_in, 4 * c: 4 * c + 4].set(
                g[:, :, p_in, 4 * c: 4 * c + 4])
    return dense
