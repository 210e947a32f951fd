"""Fused MBConv (e=1) Pallas megakernel — the EfficientNet early-stage hot path.

The B5 pretraining step is HBM-roofline-bound with convolutions at ~65% of device
time (BASELINE.md): the stage-1/2 feature maps are huge (456x760) and narrow
(C=24..48), so in the XLA NHWC path every tensor pads its lane dimension to 128
(up to 5.3x dead bytes) and every MBConv block makes ~6 padded HBM passes
(reference hot path being replaced: breastclip/model/modules/efficientnet_custom.py
MBConvBlock.forward, lines 143-225 — there a cuDNN-sequential chain).

This module executes the whole e=1 block — depthwise 3x3 -> train-mode BatchNorm ->
swish -> SqueezeExcite -> 1x1 project -> BatchNorm -> drop-connect -> residual — as a
small set of Pallas kernels over an NCHW bf16 layout in which W sits in lanes
(760 -> 768, ~1% padding) so HBM bytes are ~compact. Exact train-BN semantics are
kept by PHASING instead of materializing intermediates:

  forward
    P1  stencil x -> depthwise d; accumulate per-channel sum(d), sum(d^2)   [BN1 stats]
    jnp mu1/var1; SE weights need nothing yet
    P2  recompute d -> bn1 -> swish v; accumulate per-image sum_HW(v) [SE squeeze]
        and per-image M = sum_HW(v v^T)                                [BN2 analytic]
    jnp SE gate g; BN2 stats ANALYTICALLY from (s, M, g): y = (v*g)Wp is linear in v,
        so mean2 = E[(g*s̄)Wp] and E[y^2]_c = w_c^T (gg^T ⊙ M) w_c — no third pass
        over y is needed to get its batch statistics.
    P3  recompute d -> v; u = v*g; y = u Wp (MXU); bn2; out = x + delta*ŷ; write out

  backward (custom VJP; residuals saved: x and the tiny per-channel/per-image stats)
    B1  recompute to ȳ; reduce  sum(dŷ), sum(dŷ·ȳ)  [exact BN2 backward terms] and
        per-image T1 = sum_HW(v ⊗ dŷ), T2 = sum_HW(v ⊗ ȳ): because dy is AFFINE in
        dŷ given the BN2 reduction terms, the SE reduction sum_HW(du ⊙ v) expands
        bilinearly through Wp into T1/T2 — folding what would be a 4th pass into B1.
    jnp dgamma2/dbeta2, per-image dg -> ds through the SE MLP
    B2  recompute; dv = du*g + ds/HW; dd̂ = dv*swish'(d̂); reduce BN1 backward terms
        and the 9-tap correlation sums for dK (expanded bilinearly the same way);
        accumulate dWp = sum u ⊗ dy (MXU)
    B3  dd exact -> dx = G + corr(K̃, dd); write dx

Three reads of x + one write per direction instead of ~6 padded round trips: ~4-6x
less HBM traffic on the stage-1 blocks. Recompute is pure MXU/VPU and free at the
HBM roofline. Gather-free by construction (this pod's Mosaic lowers only single-vreg
gathers — CLAUDE.md); the stencil is 9 static shifted multiplies.

Numerics: fp32 accumulation everywhere, bf16 tensor I/O; verified against the Flax
MBConvBlock (tests/test_mbconv_pallas.py) for outputs, batch stats, and all
gradients. The flax block remains the fallback for eval mode / other block shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-3


class MBConvParams(NamedTuple):
    """Raw parameters of an e=1 MBConv block, all fp32.

    dw_kernel: (C, 3, 3)  depthwise taps (flax HWIO (3,3,1,C) transposed)
    gamma1, beta1: (C,)   bn1 scale/bias
    se_w1: (C, S), se_b1: (S,), se_w2: (S, C), se_b2: (C,)
    wp: (C, C)            project kernel (flax (1,1,C,C) squeezed: wp[c_in, c_out])
    gamma2, beta2: (C,)   bn2 scale/bias
    """

    dw_kernel: jnp.ndarray
    gamma1: jnp.ndarray
    beta1: jnp.ndarray
    se_w1: jnp.ndarray
    se_b1: jnp.ndarray
    se_w2: jnp.ndarray
    se_b2: jnp.ndarray
    wp: jnp.ndarray
    gamma2: jnp.ndarray
    beta2: jnp.ndarray


def _silu(x):
    # Mosaic mis-lowers bf16 logistic (f32 constant broadcast into a bf16
    # vector); compute the transcendental in fp32 and narrow back
    if x.dtype != jnp.float32:
        return _silu(x.astype(jnp.float32)).astype(x.dtype)
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    if x.dtype != jnp.float32:
        return _dsilu(x.astype(jnp.float32)).astype(x.dtype)
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


# --------------------------------------------------------------------------------
# shared in-kernel pieces
# --------------------------------------------------------------------------------


def _tile_with_halo(xm_ref, xt_ref, xb_ref, i, n_tiles, dtype=jnp.float32):
    """Assemble the (C, hT+2, W) tile (1-row halos, NO column extension —
    width stays a lane-tile multiple so row merges are pure reshapes).

    xm: (1, C, hT, W) main rows; xt/xb: (1, C, 8, W) NEIGHBOR blocks (Mosaic
    requires 8-row-aligned blocks) — the adjacent halo row is sliced out here and
    zero-masked at the image boundary."""
    xm = xm_ref[0].astype(dtype)
    # scalar select in fp32 (bf16 arith.select fails to legalize), then narrow
    top_m = jnp.where(i > 0, 1.0, 0.0).astype(dtype)
    bot_m = jnp.where(i < n_tiles - 1, 1.0, 0.0).astype(dtype)
    top = xt_ref[0, :, 7:8, :].astype(dtype) * top_m
    bot = xb_ref[0, :, 0:1, :].astype(dtype) * bot_m
    return jnp.concatenate([top, xm, bot], axis=1)  # (C, hT+2, W)


def _depthwise(xp, k_ref, h_tile, width):
    """d[c, r, w] = SAME-padded 3x3 depthwise of the row-extended tile xp
    (C, hT+2, W); column shifts come from an internal zero pad (the zero matches
    SAME semantics — callers keep out-of-image columns exactly zero). The 9-tap
    sum accumulates in fp32 regardless of xp's dtype (returns fp32).

    k_ref is the host-pre-expanded (C, 9, W) tap bank: Mosaic cannot broadcast
    sublanes and lanes in one op (and re-folds any in-kernel two-step broadcast),
    so every per-channel constant arrives lane-expanded and only the supported
    sublane broadcast happens in the consuming elementwise op."""
    xpp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1)))  # (C, hT+2, W+2)
    d = None
    for a in range(3):
        for b in range(3):
            tap = k_ref[:, 3 * a + b : 3 * a + b + 1, :]  # (C,1,W)
            term = (xpp[:, a : a + h_tile, b : b + width] * tap).astype(jnp.float32)
            d = term if d is None else d + term
    return d  # (C, hT, W) fp32


def _bn_apply(t, mean_ref, inv_ref, gamma_ref, beta_ref):
    """(t - mean) * inv * gamma + beta; per-channel vectors are (C, 1, W) refs."""
    return (t - mean_ref[:]) * (inv_ref[:] * gamma_ref[:]) + beta_ref[:]


def _flatten_rows(t):
    """(CH, h, w) -> (CH, h*w): merge the two minor dims with a plain reshape.

    Mosaic lowers this shape-cast cleanly when w is a multiple of the 128 lane
    tile (verified by benchmarks/probe_mosaic.py on this toolchain) — production
    callers pad widths to 128 multiples. Per-row MXU dots are NOT an option:
    each small dot pays a fixed ~1 us issue latency and the row loops dominated
    the kernel's measured device time; misaligned lane concats don't lower."""
    return t.reshape(t.shape[0], t.shape[1] * t.shape[2])


def _rowwise_ab(a, b):
    """sum_hw a[:, h, w] outer b[:, h, w] -> (Ca, Cb) fp32 as ONE MXU dot over
    the row-merged operands (tpu.matmul supports a single contracting dim per
    operand, so the (h, w) axes are merged by reshape first). Accumulation is
    fp32 whatever the operand dtype (MXU native)."""
    return jax.lax.dot_general(
        _flatten_rows(a), _flatten_rows(b),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _project(wp_ref, t, transpose=False, out_dtype=jnp.float32):
    """y[c2, h, w] = sum_c1 wp[c1, c2] t[c1, h, w] (transpose contracts c2).

    One (M, K) x (K, h*w) MXU dot over the row-merged tile, reshaped back.
    ``out_dtype`` lets wide (E-channel) results stay bf16 in VMEM — the MXU
    still accumulates fp32 internally."""
    lhs_c = 1 if transpose else 0
    h, wdt = t.shape[1], t.shape[2]
    y_cat = jax.lax.dot_general(
        wp_ref[:], _flatten_rows(t),
        dimension_numbers=(((lhs_c,), (0,)), ((), ())),
        # Mosaic requires a 32-bit matmul accumulator; narrow afterwards
        preferred_element_type=jnp.float32,
    )
    return y_cat.astype(out_dtype).reshape(y_cat.shape[0], h, wdt)


def _csum(t):
    """sum over the two minor dims, keeping rank: (C, hT, W) -> (C, 1, 1).
    Accumulates in fp32 whatever the input dtype."""
    return jnp.sum(jnp.sum(t, axis=2, keepdims=True, dtype=jnp.float32),
                   axis=1, keepdims=True)


def _first_step():
    return jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)


def _halo_specs(C, h_tile, W, H):
    """Main tile + 8-row neighbor blocks for the 1-row halos.

    h_tile must be a multiple of 8 (Mosaic block alignment); the top halo row
    i*h_tile - 1 is row 7 of 8-row block i*h_tile//8 - 1, the bottom halo row is
    row 0 of block (i+1)*h_tile//8. Index maps are in BLOCK units."""
    assert h_tile % 8 == 0 and H % h_tile == 0, (H, h_tile)
    n_tiles = H // h_tile
    r = h_tile // 8
    xm = pl.BlockSpec((1, C, h_tile, W), lambda n, i: (n, 0, i, 0),
                      memory_space=pltpu.VMEM)
    xt = pl.BlockSpec((1, C, 8, W), lambda n, i: (n, 0, jnp.maximum(i * r - 1, 0), 0),
                      memory_space=pltpu.VMEM)
    xb = pl.BlockSpec((1, C, 8, W),
                      lambda n, i: (n, 0, jnp.minimum((i + 1) * r, H // 8 - 1), 0),
                      memory_space=pltpu.VMEM)
    return n_tiles, [xm, xt, xb]


def _vec_spec(C, W):
    """(C, 1, W) lane-expanded channel-vector blocks (constant index map: the
    pipeline DMAs them once and keeps them VMEM-resident across grid steps)."""
    return pl.BlockSpec((C, 1, W), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------------
# forward phases
# --------------------------------------------------------------------------------


def _p1_kernel(n_tiles, h_tile, W, xm, xt, xb, k, sums):
    """accumulate (C, 1, 2): [sum d, sum d^2]."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles)
    d = _depthwise(xp, k, h_tile, W)

    @pl.when(_first_step())
    def _():
        sums[:] = jnp.zeros_like(sums)

    sums[:, :, 0:1] += _csum(d)
    sums[:, :, 1:2] += _csum(d * d)


def _p2_kernel(n_tiles, h_tile, W, xm, xt, xb, k, m1, inv1, g1, b1, s_out, m_out):
    """per-image s = sum_HW v (1, C) and M = sum_HW v v^T (1, C, C)."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles)
    d = _depthwise(xp, k, h_tile, W)
    v = _silu(_bn_apply(d, m1, inv1, g1, b1))

    @pl.when(i == 0)
    def _():
        s_out[:] = jnp.zeros_like(s_out)
        m_out[:] = jnp.zeros_like(m_out)

    s_out[0] += _csum(v)
    m_out[0] += _rowwise_ab(v, v)


def _p3_kernel(n_tiles, h_tile, W, residual, xm, xt, xb, k, m1, inv1, g1, b1,
               gate, wp, m2, inv2, g2, b2, delta, out):
    """out = [x +] delta * bn2(project(v * g)) in bf16 (residual iff C_in == C_out)."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles)
    d = _depthwise(xp, k, h_tile, W)
    v = _silu(_bn_apply(d, m1, inv1, g1, b1))
    u = v * gate[0]
    y = _project(wp, u)  # (C2, hT, W)
    yhat = _bn_apply(y, m2, inv2, g2, b2)
    res = delta[pl.program_id(0), 0] * yhat
    if residual:
        res = res + xm[0].astype(jnp.float32)
    out[0] = res.astype(out.dtype)


# --------------------------------------------------------------------------------
# backward phases
# --------------------------------------------------------------------------------


def _recompute_to_v(xm, xt, xb, k, m1, inv1, g1, b1, i, n_tiles, h_tile, W):
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles)
    d = _depthwise(xp, k, h_tile, W)
    dhat = _bn_apply(d, m1, inv1, g1, b1)
    return xp, d, dhat, _silu(dhat)


def _b1_kernel(n_tiles, h_tile, W, xm, xt, xb, gm, k, m1, inv1, g1, b1, gate, wp,
               m2, inv2, delta, r2_out, t1_out, t2_out):
    """reduce BN2-backward terms and the per-image SE bilinear matrices.

    r2_out (C2, 1, 2): [sum dŷ, sum dŷ·ȳ]; t1/t2 (1, C, C2): sum_HW v ⊗ dŷ, v ⊗ ȳ.
    """
    i = pl.program_id(1)
    _, _, _, v = _recompute_to_v(xm, xt, xb, k, m1, inv1, g1, b1, i, n_tiles, h_tile, W)
    u = v * gate[0]
    y = _project(wp, u)
    ybar = (y - m2[:]) * inv2[:]
    dyhat = gm[0].astype(jnp.float32) * delta[pl.program_id(0), 0]

    @pl.when(_first_step())
    def _():
        r2_out[:] = jnp.zeros_like(r2_out)

    @pl.when(i == 0)
    def _():
        t1_out[:] = jnp.zeros_like(t1_out)
        t2_out[:] = jnp.zeros_like(t2_out)

    r2_out[:, :, 0:1] += _csum(dyhat)
    r2_out[:, :, 1:2] += _csum(dyhat * ybar)
    t1_out[0] += _rowwise_ab(v, dyhat)
    t2_out[0] += _rowwise_ab(v, ybar)


def _dy_tile(gm, v, gate, wp, m2, inv2, g2, alpha, beta_r, delta):
    """dy = A·dŷ - a - ȳ·b with per-channel constants; recomputes y/ȳ from v."""
    u = v * gate[0]
    y = _project(wp, u)
    ybar = (y - m2[:]) * inv2[:]
    dyhat = gm[0].astype(jnp.float32) * delta[pl.program_id(0), 0]
    dy = (g2[:] * inv2[:]) * dyhat - alpha[:] - ybar * beta_r[:]
    return u, y, ybar, dy


def _b2_kernel(n_tiles, h_tile, W, xm, xt, xb, gm, k, m1, inv1, g1, b1, gate, wp,
               m2, inv2, g2, alpha, beta_r, ds_hw, delta,
               r1_out, dwp_out, taps_out):
    """reduce BN1-backward terms, dWp, and the 9-tap dK correlation sums.

    r1_out (C, 1, 2): [sum dd̂, sum dd̂·d̄]
    dwp_out (C, C2): sum u ⊗ dy
    taps_out (C, 1, 27): [sum_tap x, sum_tap x·d̄, sum_tap x·dd̂] x 9 (a, b) taps
    """
    i = pl.program_id(1)
    xp, d, dhat, v = _recompute_to_v(xm, xt, xb, k, m1, inv1, g1, b1, i,
                                     n_tiles, h_tile, W)
    u, y, ybar, dy = _dy_tile(gm, v, gate, wp, m2, inv2, g2, alpha, beta_r,
                              delta)
    # du[c1] = sum_c2 wp[c1, c2] dy[c2] (project contracted on the output channel)
    du = _project(wp, dy, transpose=True)
    dv = du * gate[0] + ds_hw[0]
    ddhat = dv * _dsilu(dhat)
    dbar = (d - m1[:]) * inv1[:]

    @pl.when(_first_step())
    def _():
        r1_out[:] = jnp.zeros_like(r1_out)
        dwp_out[:] = jnp.zeros_like(dwp_out)
        taps_out[:] = jnp.zeros_like(taps_out)

    r1_out[:, :, 0:1] += _csum(ddhat)
    r1_out[:, :, 1:2] += _csum(ddhat * dbar)
    dwp_out[:, :] += _rowwise_ab(u, dy)
    xpp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1)))  # column shifts for the taps
    for a in range(3):
        for b in range(3):
            xs = xpp[:, a : a + h_tile, b : b + W]
            j = (3 * a + b) * 3
            taps_out[:, :, j : j + 1] += _csum(xs)
            taps_out[:, :, j + 1 : j + 2] += _csum(xs * dbar)
            taps_out[:, :, j + 2 : j + 3] += _csum(xs * ddhat)


def _b3_kernel(n_tiles, h_tile, W, residual, xm, xt, xb, gm, gt, gb, k, m1, inv1,
               g1, b1, gate, wp, m2, inv2, g2, alpha, beta_r, ds_hw, r1a, r1b,
               delta, dx_out):
    """dx = G + corr(K, dd) where dd needs a halo of the ROW-NEIGHBOR tiles' dd.

    dd at rows [-1, hT] is recomputed directly: the halo'd x tile carries rows
    [-1, hT+1), and dd on its edge rows needs x rows [-2, hT+2) — so this kernel
    takes a 2-row halo (the xt/xb specs fetch 2 rows here).
    """
    i = pl.program_id(1)
    # assemble a (C, hT+4, W+2) x tile (2-row halos sliced from the 8-row
    # neighbor blocks, zero-masked at the image boundary)
    xmv = xm[0].astype(jnp.float32)
    top_m = jnp.where(i > 0, 1.0, 0.0)
    bot_m = jnp.where(i < n_tiles - 1, 1.0, 0.0)
    rows_top = xt[0, :, 6:8, :].astype(jnp.float32) * top_m
    rows_bot = xb[0, :, 0:2, :].astype(jnp.float32) * bot_m
    xfull = jnp.concatenate([rows_top, xmv, rows_bot], axis=1)  # (C, hT+4, W)
    xf = jnp.pad(xfull, ((0, 0), (0, 0), (1, 1)))  # column shifts only

    # dd on rows [-1, hT+1): recompute d on those rows (needs x rows [-2, hT+2))
    h_ext = h_tile + 2
    d_ext = None
    for a in range(3):
        for b in range(3):
            tap = k[:, 3 * a + b : 3 * a + b + 1, :]
            term = xf[:, a : a + h_ext, b : b + W] * tap
            d_ext = term if d_ext is None else d_ext + term
    dhat_ext = _bn_apply(d_ext, m1, inv1, g1, b1)
    v_ext = _silu(dhat_ext)
    # grads G on the extended rows: gm plus 1-row halos from the 8-row G blocks
    g_top = gt[0, :, 7:8, :].astype(jnp.float32) * top_m
    g_bot = gb[0, :, 0:1, :].astype(jnp.float32) * bot_m
    g_ext = jnp.concatenate([g_top, gm[0].astype(jnp.float32), g_bot], axis=1)

    u_ext = v_ext * gate[0]
    y_ext = _project(wp, u_ext)
    ybar_ext = (y_ext - m2[:]) * inv2[:]
    dyhat_ext = g_ext * delta[pl.program_id(0), 0]
    dy_ext = (g2[:] * inv2[:]) * dyhat_ext - alpha[:] - ybar_ext * beta_r[:]
    du_ext = _project(wp, dy_ext, transpose=True)
    dv_ext = du_ext * gate[0] + ds_hw[0]
    ddhat_ext = dv_ext * _dsilu(dhat_ext)
    dbar_ext = (d_ext - m1[:]) * inv1[:]
    dd_ext = (g1[:] * inv1[:]) * ddhat_ext - r1a[:] - dbar_ext * r1b[:]
    # zero dd on rows outside the image (the recompute used zero-masked x, but
    # BN subtraction makes out-of-image dd nonzero — mask explicitly)
    row0_valid = jnp.where(i > 0, 1.0, 0.0)
    rowl_valid = jnp.where(i < n_tiles - 1, 1.0, 0.0)
    mask = jnp.concatenate(
        [
            jnp.full((1, 1, W), row0_valid, jnp.float32),
            jnp.ones((1, h_tile, W), jnp.float32),
            jnp.full((1, 1, W), rowl_valid, jnp.float32),
        ],
        axis=1,
    )
    dd_ext = dd_ext * mask
    dd_pad = jnp.pad(dd_ext, ((0, 0), (0, 0), (1, 1)))  # (C, hT+2, W+2)

    # dx[c, r, w] = G + sum_ab K[c, a, b] * dd[c, r - 1 + a?, ...] (correlation
    # transpose): dx = sum_ab K[a,b] * dd[r + (1 - a), w + (1 - b)] over the
    # extended rows — equivalently conv of dd with the 180°-flipped kernel.
    dx = None
    for a in range(3):
        for b in range(3):
            tap = k[:, 3 * a + b : 3 * a + b + 1, :]
            term = dd_pad[:, (2 - a) : (2 - a) + h_tile, (2 - b) : (2 - b) + W] * tap
            dx = term if dx is None else dx + term
    if residual:
        dx = dx + gm[0].astype(jnp.float32)
    dx_out[0] = dx.astype(dx_out.dtype)


# --------------------------------------------------------------------------------
# host-side (traced) glue
# --------------------------------------------------------------------------------


def _channel_vecs(width, *vs, dtype=jnp.float32):
    """Lane-expand channel vectors to (C, 1, W) on the host side (see _depthwise)."""
    return [
        jnp.broadcast_to(v.reshape(-1, 1, 1).astype(dtype), (v.size, 1, width))
        for v in vs
    ]


def _se_gate(s_mean, p: MBConvParams):
    """s_mean: (N, C) spatial mean -> gate (N, C) and the SE intermediates."""
    z1 = s_mean @ p.se_w1 + p.se_b1
    a1 = _silu(z1)
    z2 = a1 @ p.se_w2 + p.se_b2
    return jax.nn.sigmoid(z2), (z1, a1, z2)


def _grid_call(kernel, *, grid, in_specs, out_shape, out_specs, interpret):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=interpret,
        # stage-1 tiles (fp32 working set + double-buffered bf16 blocks) run just
        # past the default 16 MB scoped-vmem budget; v5e has headroom above that
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )


def _pick_h_tile(H: int) -> int:
    """Tile heights are multiples of 8 (Mosaic block alignment)."""
    for t in (24, 16, 8):
        if H % t == 0:
            return t
    raise ValueError(f"H={H} not divisible by a supported tile height (mult of 8)")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mbconv_e1(x, params: MBConvParams, delta, eps: float = BN_EPS,
                    interpret: bool = False):
    out, stats, _ = _forward(x, params, delta, eps, interpret)
    return out, stats


def _forward(x, p: MBConvParams, delta, eps, interpret):
    """x: (N, C, H, W) bf16; delta: (N,) drop-connect scale. Returns
    (out, (mean1, var1, mean2, var2), saved)."""
    N, C, H, W = x.shape
    C2 = p.wp.shape[1]
    residual = C2 == C  # e=1 blocks are always stride 1
    h_tile = _pick_h_tile(H)
    n_tiles, halo = _halo_specs(C, h_tile, W, H)
    grid = (N, n_tiles)
    nhw = N * H * W
    kspec = pl.BlockSpec((C, 9, W), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM)
    k = jnp.broadcast_to(
        p.dw_kernel.astype(jnp.float32).reshape(C, 9, 1), (C, 9, W)
    )

    # ---- P1: BN1 batch stats
    sums = _grid_call(
        functools.partial(_p1_kernel, n_tiles, h_tile, W),
        grid=grid,
        in_specs=halo + [kspec],
        out_shape=jax.ShapeDtypeStruct((C, 1, 2), jnp.float32),
        out_specs=pl.BlockSpec((C, 1, 2), lambda n, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, k)
    mean1 = sums[:, 0, 0] / nhw
    var1 = jnp.maximum(sums[:, 0, 1] / nhw - mean1 * mean1, 0.0)
    inv1 = jax.lax.rsqrt(var1 + eps)

    m1v, inv1v, g1v, b1v = _channel_vecs(W, mean1, inv1, p.gamma1, p.beta1)
    vec = _vec_spec(C, W)

    # ---- P2: SE squeeze + per-image second moments
    s_sum, m_img = _grid_call(
        functools.partial(_p2_kernel, n_tiles, h_tile, W),
        grid=grid,
        in_specs=halo + [kspec, vec, vec, vec, vec],
        out_shape=(
            jax.ShapeDtypeStruct((N, C, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, C, C), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, C, 1, 1), lambda n, i: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, x, x, k, m1v, inv1v, g1v, b1v)
    s_sum = s_sum[:, :, 0, 0]
    hw = H * W
    s_mean = s_sum / hw
    gate, _ = _se_gate(s_mean, p)  # (N, C)

    # ---- BN2 stats, analytically: y = (v * g) Wp
    wp = p.wp.astype(jnp.float32)
    mean2 = jnp.einsum("nc,cd->d", gate * s_sum, wp) / nhw
    gg_m = jnp.einsum("nc,ne,nce->ce", gate, gate, m_img)  # sum_img gg^T ⊙ M
    ey2 = jnp.einsum("cd,ce,ed->d", wp, gg_m, wp) / nhw
    var2 = jnp.maximum(ey2 - mean2 * mean2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + eps)

    m2v, inv2v, g2v, b2v = _channel_vecs(W, mean2, inv2, p.gamma2, p.beta2)
    vec2 = _vec_spec(C2, W)
    gate_rows = jnp.broadcast_to(
        gate.reshape(N, C, 1, 1).astype(jnp.float32), (N, C, 1, W)
    )
    gate_spec = pl.BlockSpec((1, C, 1, W), lambda n, i: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((C, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM)
    delta_rows = delta.reshape(N, 1).astype(jnp.float32)
    dspec = pl.BlockSpec((N, 1), lambda n, i: (0, 0), memory_space=pltpu.SMEM)

    # ---- P3: apply + write
    out = _grid_call(
        functools.partial(_p3_kernel, n_tiles, h_tile, W, residual),
        grid=grid,
        in_specs=halo + [kspec, vec, vec, vec, vec, gate_spec, wspec,
                         vec2, vec2, vec2, vec2, dspec],
        out_shape=jax.ShapeDtypeStruct((N, C2, H, W), x.dtype),
        out_specs=pl.BlockSpec((1, C2, h_tile, W), lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, k, m1v, inv1v, g1v, b1v, gate_rows, wp, m2v, inv2v, g2v, b2v,
      delta_rows)

    saved = (x, delta, mean1, var1, mean2, var2, s_mean, gate)
    return out, (mean1, var1, mean2, var2), saved


def _fwd(x, params, delta, eps, interpret):
    out, stats, saved = _forward(x, params, delta, eps, interpret)
    return (out, stats), (saved, params)


def _bwd(eps, interpret, res, cot):
    (x, delta, mean1, var1, mean2, var2, s_mean, gate), p = res
    g_out, _ = cot  # cotangent of batch stats ignored (stats feed running averages)
    N, C, H, W = x.shape
    C2 = p.wp.shape[1]
    residual = C2 == C
    h_tile = _pick_h_tile(H)
    n_tiles, halo = _halo_specs(C, h_tile, W, H)
    grid = (N, n_tiles)
    nhw = N * H * W
    hw = H * W
    kspec = pl.BlockSpec((C, 9, W), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM)
    k = jnp.broadcast_to(
        p.dw_kernel.astype(jnp.float32).reshape(C, 9, 1), (C, 9, W)
    )
    inv1 = jax.lax.rsqrt(var1 + eps)
    inv2 = jax.lax.rsqrt(var2 + eps)
    vec = _vec_spec(C, W)
    vec2 = _vec_spec(C2, W)
    m1v, inv1v, g1v, b1v = _channel_vecs(W, mean1, inv1, p.gamma1, p.beta1)
    m2v, inv2v, g2v, b2v = _channel_vecs(W, mean2, inv2, p.gamma2, p.beta2)
    gate_rows = jnp.broadcast_to(
        gate.reshape(N, C, 1, 1).astype(jnp.float32), (N, C, 1, W)
    )
    gate_spec = pl.BlockSpec((1, C, 1, W), lambda n, i: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    wp = p.wp.astype(jnp.float32)
    wspec = pl.BlockSpec((C, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM)
    delta_rows = delta.reshape(N, 1).astype(jnp.float32)
    dspec = pl.BlockSpec((N, 1), lambda n, i: (0, 0), memory_space=pltpu.SMEM)
    gspec_main = pl.BlockSpec((1, C2, h_tile, W), lambda n, i: (n, 0, i, 0),
                              memory_space=pltpu.VMEM)

    # ---- B1
    r2, t1, t2 = _grid_call(
        functools.partial(_b1_kernel, n_tiles, h_tile, W),
        grid=grid,
        in_specs=halo + [gspec_main, kspec, vec, vec, vec, vec, gate_spec, wspec,
                         vec2, vec2, dspec],
        out_shape=(
            jax.ShapeDtypeStruct((C2, 1, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, C, C2), jnp.float32),
            jax.ShapeDtypeStruct((N, C, C2), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((C2, 1, 2), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C2), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C2), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, x, x, g_out, k, m1v, inv1v, g1v, b1v, gate_rows, wp, m2v, inv2v,
      delta_rows)

    r2_0 = r2[:, 0, 0]
    r2_1 = r2[:, 0, 1]
    dgamma2 = r2_1
    dbeta2 = r2_0
    # dy = (gamma2*inv2)·dŷ - alpha - ȳ·beta_r  (exact BN backward, batch stats)
    alpha = p.gamma2 * inv2 * r2_0 / nhw
    beta_r = p.gamma2 * inv2 * r2_1 / nhw

    # SE backward from the bilinear matrices:
    # sum_HW (du ⊙ v)_{c1} = sum_c2 wp[c1,c2] ((g2 inv2)_c2 T1[c1,c2]
    #                          - alpha_c2 s_sum[c1] - beta_c2 T2[c1,c2])
    s_sum = s_mean * hw
    dg = (
        jnp.einsum("ce,e,nce->nc", wp, p.gamma2 * inv2, t1)
        - jnp.einsum("ce,e->c", wp, alpha)[None, :] * s_sum
        - jnp.einsum("ce,e,nce->nc", wp, beta_r, t2)
    )  # (N, C): dL/dg per image
    _, (z1, a1, z2) = _se_gate(s_mean, p)
    sig2 = jax.nn.sigmoid(z2)
    dz2 = dg * sig2 * (1.0 - sig2)
    dse_w2 = jnp.einsum("ns,nc->sc", a1, dz2)
    dse_b2 = jnp.sum(dz2, axis=0)
    da1 = dz2 @ p.se_w2.T
    dz1 = da1 * _dsilu(z1)
    dse_w1 = jnp.einsum("nc,ns->cs", s_mean, dz1)
    dse_b1 = jnp.sum(dz1, axis=0)
    ds = dz1 @ p.se_w1.T  # (N, C): dL/ds_mean
    ds_hw = jnp.broadcast_to(
        (ds / hw).reshape(N, C, 1, 1).astype(jnp.float32), (N, C, 1, W)
    )  # per-pixel dv addend

    ds_spec = pl.BlockSpec((1, C, 1, W), lambda n, i: (n, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    alphav, betav = _channel_vecs(W, alpha, beta_r)

    # ---- B2
    r1, dwp, taps = _grid_call(
        functools.partial(_b2_kernel, n_tiles, h_tile, W),
        grid=grid,
        in_specs=halo + [gspec_main, kspec, vec, vec, vec, vec, gate_spec, wspec,
                         vec2, vec2, vec2, vec2, vec2, ds_spec, dspec],
        out_shape=(
            jax.ShapeDtypeStruct((C, 1, 2), jnp.float32),
            jax.ShapeDtypeStruct((C, C2), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, 27), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((C, 1, 2), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, 27), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, x, x, g_out, k, m1v, inv1v, g1v, b1v, gate_rows, wp, m2v, inv2v, g2v,
      alphav, betav, ds_hw, delta_rows)

    r1_0 = r1[:, 0, 0]
    r1_1 = r1[:, 0, 1]
    dgamma1 = r1_1
    dbeta1 = r1_0
    r1a = p.gamma1 * inv1 * r1_0 / nhw
    r1b = p.gamma1 * inv1 * r1_1 / nhw
    # dK from the tap sums: dd = (g1 inv1)·dd̂ - r1a - d̄·r1b
    t = taps[:, 0, :].reshape(C, 9, 3)  # [:, tap, (x, x·d̄, x·dd̂)]
    dk = (
        (p.gamma1 * inv1)[:, None] * t[:, :, 2]
        - r1a[:, None] * t[:, :, 0]
        - r1b[:, None] * t[:, :, 1]
    )  # (C, 9)
    ddw = dk.reshape(C, 3, 3)

    r1av, r1bv = _channel_vecs(W, r1a, r1b)
    # ---- B3: halo specs with 2 rows for x, 1 row for G
    # B3 needs 2-row x halos and 1-row G halos: all served by the same 8-row
    # neighbor blocks (sliced in-kernel; index maps in BLOCK units of 8 rows).
    r8 = h_tile // 8
    xt2 = pl.BlockSpec((1, C, 8, W), lambda n, i: (n, 0, jnp.maximum(i * r8 - 1, 0), 0),
                       memory_space=pltpu.VMEM)
    xb2 = pl.BlockSpec((1, C, 8, W),
                       lambda n, i: (n, 0, jnp.minimum((i + 1) * r8, H // 8 - 1), 0),
                       memory_space=pltpu.VMEM)
    gt = pl.BlockSpec((1, C2, 8, W), lambda n, i: (n, 0, jnp.maximum(i * r8 - 1, 0), 0),
                      memory_space=pltpu.VMEM)
    gb = pl.BlockSpec((1, C2, 8, W),
                      lambda n, i: (n, 0, jnp.minimum((i + 1) * r8, H // 8 - 1), 0),
                      memory_space=pltpu.VMEM)
    xm = halo[0]
    dx = _grid_call(
        functools.partial(_b3_kernel, n_tiles, h_tile, W, residual),
        grid=grid,
        in_specs=[xm, xt2, xb2, gspec_main, gt, gb, kspec, vec, vec, vec, vec,
                  gate_spec, wspec, vec2, vec2, vec2, vec2, vec2, ds_spec, vec,
                  vec, dspec],
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), x.dtype),
        out_specs=pl.BlockSpec((1, C, h_tile, W), lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, g_out, g_out, g_out, k, m1v, inv1v, g1v, b1v, gate_rows, wp,
      m2v, inv2v, g2v, alphav, betav, ds_hw, r1av, r1bv, delta_rows)

    dparams = MBConvParams(
        dw_kernel=ddw.astype(p.dw_kernel.dtype),
        gamma1=dgamma1.astype(p.gamma1.dtype),
        beta1=dbeta1.astype(p.beta1.dtype),
        se_w1=dse_w1.astype(p.se_w1.dtype),
        se_b1=dse_b1.astype(p.se_b1.dtype),
        se_w2=dse_w2.astype(p.se_w2.dtype),
        se_b2=dse_b2.astype(p.se_b2.dtype),
        wp=dwp.astype(p.wp.dtype),
        gamma2=dgamma2.astype(p.gamma2.dtype),
        beta2=dbeta2.astype(p.beta2.dtype),
    )
    ddelta = jnp.zeros_like(delta)  # delta is a non-trainable RNG draw
    return dx, dparams, ddelta


fused_mbconv_e1.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------------
# pure-JAX reference (same math, unfused) — used by tests and as documentation
# --------------------------------------------------------------------------------


def mbconv_e1_reference(x, p: MBConvParams, delta, eps: float = BN_EPS):
    """Unfused NCHW reference of the identical block math (train-mode BN)."""
    xf = x.astype(jnp.float32)
    k = p.dw_kernel.astype(jnp.float32)  # (C, 3, 3)
    d = jax.lax.conv_general_dilated(
        xf, k[:, None].transpose(2, 3, 1, 0),  # HWIO (3,3,1,C)
        (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=x.shape[1],
    )
    mean1 = jnp.mean(d, axis=(0, 2, 3))
    var1 = jnp.maximum(jnp.mean(d * d, axis=(0, 2, 3)) - mean1 ** 2, 0.0)
    dhat = (d - mean1[:, None, None]) * jax.lax.rsqrt(var1 + eps)[:, None, None]
    dhat = dhat * p.gamma1[:, None, None] + p.beta1[:, None, None]
    v = _silu(dhat)
    s = jnp.mean(v, axis=(2, 3))
    gate, _ = _se_gate(s, p)
    u = v * gate[:, :, None, None]
    y = jnp.einsum("nchw,cd->ndhw", u, p.wp.astype(jnp.float32))
    mean2 = jnp.mean(y, axis=(0, 2, 3))
    var2 = jnp.maximum(jnp.mean(y * y, axis=(0, 2, 3)) - mean2 ** 2, 0.0)
    yhat = (y - mean2[:, None, None]) * jax.lax.rsqrt(var2 + eps)[:, None, None]
    yhat = yhat * p.gamma2[:, None, None] + p.beta2[:, None, None]
    out = delta[:, None, None, None] * yhat
    if p.wp.shape[1] == x.shape[1]:  # residual iff C_in == C_out (stride is 1)
        out = out + xf
    return out.astype(x.dtype), (mean1, var1, mean2, var2)
