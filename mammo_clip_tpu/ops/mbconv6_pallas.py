"""Fused expanding MBConv (e>1) Pallas megakernel — the EfficientNet stage-2 hot path.

Stage 2 of the B5 encoder runs five e=6 blocks at 228x380 with 40 in/out channels:
the XLA path materializes ~6 HBM round trips of the 6x-EXPANDED (E=240 channel)
intermediates per block per direction (~42 MB/view each), which BASELINE.md's
roofline study puts at ~35% of encoder traffic. Reference hot path being replaced:
breastclip/model/modules/efficientnet_custom.py MBConvBlock.forward (expand ->
depthwise -> SE -> project chain, lines 143-225).

This kernel executes the whole block over the lane-compact NCHW input ONLY —
the expanded tensors never leave VMEM:

  x --We--> z --bn0,silu--> w --dw3x3--> d --bn1,silu--> v --SE--> u --Wp--> y
    --bn2--> yhat ;  out = x + delta * yhat

Train-mode BatchNorm is exact, via phasing + two analytic tricks:

  P1  reduce  sum(x), sum(x xT)            [bn0 stats ANALYTICALLY: z = x We is
      linear in x, so E[z] and E[z^2] come from x's first two moments — no pass
      over the expanded z is ever needed]
  P2  recompute z->w, depthwise -> d; reduce sum(d), sum(d^2)        [bn1 stats]
  P3  recompute -> v; reduce per-image sum_HW(v)                     [SE squeeze]
  P4  recompute -> v, u = v*g, y = u Wp; reduce sum(y), sum(y^2)     [bn2 stats]
      (y has only C2 channels, so a direct reduction is cheaper than the
      e=1 kernel's covariance trick at E=240)
  P5  recompute -> yhat; out = x + delta*yhat; write

  B1  recompute -> v, y, ybar; reduce sum(dyh), sum(dyh*ybar) [bn2 backward] and
      per-image T1 = sum_HW(v (x) dyh), T2 = sum_HW(v (x) ybar): dy is AFFINE in
      dyh given the bn2 reduction terms, so the SE reduction sum_HW(du . v)
      expands bilinearly through Wp into T1/T2.
  B2  recompute; dv = du*g + ds/HW; db1h = dv*silu'(d^); reduce bn1 backward
      terms, dWp = sum u (x) dy, and the 9-tap correlation sums for dK.
  B3  recompute with 2-row halos -> dd (exact) -> dL/dw = corr(K~, dd) ->
      dz0h; reduce bn0 backward terms and T3 = sum(x (x) dz0h)
      [dWe ANALYTICALLY from T3 + the P1 moments: sum x (x) zbar = f(S, We)]
  B4  recompute -> dz exact; dx = G + dz We^T; write

Eight passes that each read only the compact x (+ the same-size cotangent in the
backward) instead of ~12 expanded-tensor round trips: ~5-8x less HBM traffic.
All recompute is MXU/VPU work on VMEM-resident tiles; every channel contraction
is ONE long-K MXU dot over row-merged tiles (per-row dots pay a ~1 us fixed
issue cost each and dominated the device time of the first kernel revision).

MEASURED VERDICT on this pod's v5e (BASELINE.md round-2 kernel study): the
traffic win does not convert into time — the phased recompute makes the kernel
VPU-elementwise-bound (~60 full-tile vector ops per pass x 9 passes), and
Mosaic's elementwise throughput here is several times below XLA's fused
emitters, so the fused block runs slower end-to-end than the XLA path it
replaces. It is kept as an OPT-IN capability (exact train-BN fusion with
compact residuals; ``fused_mbconv`` defaults to False) and as the repo's
documented map of this toolchain's Mosaic constraint surface.

Alignment contract (why valid_h AND valid_w exist): row merges are plain
reshapes only when the tile width is a multiple of the 128-lane tile, so the
caller pads BOTH dimensions — H to a tile-height multiple, W to a multiple of
128 — with zeros, once per run of fused blocks. ``valid_h``/``valid_w`` are
static; every reduction masks the pad region, the activation w is re-zeroed
outside the valid image (silu(bn0(0)) != 0) so the depthwise stencil sees exact
SAME-padding semantics at the edges, and both outputs (out, dx) are written
with ZERO pads so consecutive fused blocks chain without re-padding.

Mosaic constraints (this pod, see CLAUDE.md + ops/mbconv_pallas.py +
benchmarks/probe_mosaic.py): gather-free, reshape-merged dots (misaligned lane
concats don't lower), integer-only iota, 8-row-aligned halo blocks, channel
vectors pre-expanded to lanes host-side, scalars in SMEM, ~100 MB scoped-vmem
stack (tile heights are budgeted against it). Verified against the unfused
reference and the Flax MBConvBlock for outputs, batch stats, and every gradient
(tests/test_mbconv6_pallas.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mbconv_pallas import (
    BN_EPS,
    MBConvParams,
    _channel_vecs,
    _csum,
    _depthwise,
    _dsilu,
    _first_step,
    _grid_call,
    _halo_specs,
    _project,
    _rowwise_ab,
    _se_gate,
    _silu,
    _tile_with_halo,
    _vec_spec,
)


class MBConv6Params(NamedTuple):
    """Raw parameters of an expanding MBConv block, all fp32.

    we: (C, E)            expand 1x1 kernel (flax (1,1,C,E) squeezed)
    gamma0, beta0: (E,)   bn0 (post-expand) scale/bias
    dw_kernel: (E, 3, 3)  depthwise taps
    gamma1, beta1: (E,)   bn1 (post-depthwise) scale/bias
    se_w1: (E, S), se_b1: (S,), se_w2: (S, E), se_b2: (E,)   [S = C * se_ratio]
    wp: (E, C2)           project kernel
    gamma2, beta2: (C2,)  bn2 scale/bias
    """

    we: jnp.ndarray
    gamma0: jnp.ndarray
    beta0: jnp.ndarray
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


def _bnv(t, mean_ref, inv_ref, gamma_ref, beta_ref):
    """bn over a (CH, h, W) tile with (CH, 1, W) lane-expanded vector refs."""
    return (t - mean_ref[:]) * (inv_ref[:] * gamma_ref[:]) + beta_ref[:]


def _row_mask(shape2d, i, h_tile, valid_h, row_offset, dtype=jnp.float32):
    """(rows, cols) mask: 1 where the GLOBAL row i*h_tile + r - row_offset
    lies in [0, valid_h). Built as a 2-D sublane iota (Mosaic: iota is int-only)
    and broadcast over the leading channel dim by the consuming op."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape2d, 0)
    g = r + (i * h_tile - row_offset)
    # select in fp32, then narrow: Mosaic cannot relayout the i1 predicate from
    # the 32-bit (8,128) tiling to bf16's packed (16,128) tiling directly
    m = jnp.where((g >= 0) & (g < valid_h), 1.0, 0.0)
    return m if dtype == jnp.float32 else m.astype(dtype)


def _col_mask(shape2d, valid_w, dtype=jnp.float32):
    """(rows, cols) mask: 1 on columns [0, valid_w)."""
    c = jax.lax.broadcasted_iota(jnp.int32, shape2d, 1)
    m = jnp.where(c < valid_w, 1.0, 0.0)
    return m if dtype == jnp.float32 else m.astype(dtype)


def _om(i, h_tile, W, valid_h, valid_w, dtype=jnp.float32, rows=None, off=0):
    rows = h_tile if rows is None else rows
    return _row_mask((rows, W), i, h_tile, valid_h, off, dtype) * \
        _col_mask((rows, W), valid_w, dtype)


def _w_tile(cdt, expand, xp, we, m0, inv0, g0, b0, i, h_tile, valid_h, valid_w):
    """The depthwise input on a (C, rows, W) x tile.

    expand=True: -> (E, rows, W) expanded+activated w in the compute dtype cdt,
    masked so out-of-image rows/cols are exactly zero (SAME-pad semantics: the
    padded x is zero there, but silu(bn0(0)) is not — the mask restores the
    truth). expand=False (e=1 blocks): the depthwise consumes x directly, whose
    pad region is zero by caller contract — no mask, no dot (we/bn0 refs are
    host-side dummies).

    The row offset is the halo depth: fwd tiles carry 1 extra row each side,
    the B3/B4 tiles 2. Inferred from rows - h_tile."""
    if not expand:
        return xp
    rows, width = xp.shape[1], xp.shape[2]
    halo = (rows - h_tile) // 2
    z = _project(we, xp, out_dtype=cdt)  # (E, rows, W) — one row-merged MXU dot
    w = _silu(_bnv(z, m0, inv0, g0, b0))
    mask = _row_mask((rows, width), i, h_tile, valid_h, halo, cdt) * \
        _col_mask((rows, width), valid_w, cdt)
    return w * mask


# --------------------------------------------------------------------------------
# forward phases
# --------------------------------------------------------------------------------


def _p1_kernel(xm, sx_out, sxx_out):
    """x first/second moments. Pad rows/cols are zero by caller contract, so no
    masking is needed here."""
    x = xm[0].astype(jnp.float32)

    @pl.when(_first_step())
    def _():
        sx_out[:] = jnp.zeros_like(sx_out)
        sxx_out[:] = jnp.zeros_like(sxx_out)

    sx_out[:] += _csum(x)
    sxx_out[:, :] += _rowwise_ab(x, x)


def _p2_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, k, we,
               m0, inv0, g0, b0, sums):
    """accumulate (E, 1, 2): [sum d, sum d^2] over the valid region (d stays
    fp32 here for the variance reduction)."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles, cdt)
    w = _w_tile(cdt, expand, xp, we, m0, inv0, g0, b0, i, h_tile, valid_h,
                valid_w)
    d = _depthwise(w, k, h_tile, W)
    om = _om(i, h_tile, W, valid_h, valid_w)

    @pl.when(_first_step())
    def _():
        sums[:] = jnp.zeros_like(sums)

    sums[:, :, 0:1] += _csum(d * om)
    sums[:, :, 1:2] += _csum(d * d * om)


def _p3_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, k, we,
               m0, inv0, g0, b0, m1, inv1, g1, b1, s_out):
    """per-image SE squeeze: s = sum over the valid region of v, (N, E)."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles, cdt)
    w = _w_tile(cdt, expand, xp, we, m0, inv0, g0, b0, i, h_tile, valid_h,
                valid_w)
    d = _depthwise(w, k, h_tile, W).astype(cdt)
    v = _silu(_bnv(d, m1, inv1, g1, b1))
    om = _om(i, h_tile, W, valid_h, valid_w)

    @pl.when(i == 0)
    def _():
        s_out[:] = jnp.zeros_like(s_out)

    s_out[0] += _csum(v * om)


def _p4_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, k, we,
               m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp, r_y):
    """accumulate (C2, 1, 2): [sum y, sum y^2]; u is masked so y vanishes on the
    pad region and the reduction needs no further masking."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles, cdt)
    w = _w_tile(cdt, expand, xp, we, m0, inv0, g0, b0, i, h_tile, valid_h,
                valid_w)
    d = _depthwise(w, k, h_tile, W).astype(cdt)
    v = _silu(_bnv(d, m1, inv1, g1, b1))
    om = _om(i, h_tile, W, valid_h, valid_w, cdt)
    u = v * om * gate[0]
    y = _project(wp, u)  # (C2, hT, W) fp32

    @pl.when(_first_step())
    def _():
        r_y[:] = jnp.zeros_like(r_y)

    r_y[:, :, 0:1] += _csum(y)
    r_y[:, :, 1:2] += _csum(y * y)


def _p5_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, residual, xm, xt, xb,
               k, we, m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp,
               m2, inv2, g2, b2, delta, out):
    """out = ([x +] delta * bn2(project(v * g))) * mask — ZERO pads out, so the
    next fused block's zero-pad input contract holds without re-padding."""
    i = pl.program_id(1)
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles, cdt)
    w = _w_tile(cdt, expand, xp, we, m0, inv0, g0, b0, i, h_tile, valid_h,
                valid_w)
    d = _depthwise(w, k, h_tile, W).astype(cdt)
    v = _silu(_bnv(d, m1, inv1, g1, b1))
    u = v * gate[0]
    y = _project(wp, u)  # (C2, hT, W) fp32
    yhat = (y - m2[:].astype(jnp.float32)) * \
        (inv2[:].astype(jnp.float32) * g2[:].astype(jnp.float32)) + \
        b2[:].astype(jnp.float32)
    res = delta[pl.program_id(0), 0] * yhat
    if residual:
        res = res + xm[0].astype(jnp.float32)
    om = _om(i, h_tile, W, valid_h, valid_w)
    out[0] = (res * om).astype(out.dtype)


# --------------------------------------------------------------------------------
# backward phases
# --------------------------------------------------------------------------------


def _recompute_to_v(cdt, expand, xm, xt, xb, k, we, m0, inv0, g0, b0, m1, inv1, g1, b1,
                    i, n_tiles, h_tile, W, valid_h, valid_w):
    xp = _tile_with_halo(xm, xt, xb, i, n_tiles, cdt)
    w = _w_tile(cdt, expand, xp, we, m0, inv0, g0, b0, i, h_tile, valid_h,
                valid_w)
    d = _depthwise(w, k, h_tile, W).astype(cdt)
    dhat = _bnv(d, m1, inv1, g1, b1)
    return w, d, dhat, _silu(dhat)


def _b1_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, gm, k, we,
               m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp, m2, inv2,
               delta, r2_out, t1_out, t2_out):
    """bn2-backward terms + the per-image SE bilinear matrices.

    r2_out (C2, 1, 2): [sum dyh, sum dyh*ybar]; t1/t2 (1, E, C2)."""
    i = pl.program_id(1)
    _, _, _, v = _recompute_to_v(cdt, expand, xm, xt, xb, k, we, m0, inv0, g0, b0,
                                 m1, inv1, g1, b1, i, n_tiles, h_tile, W,
                                 valid_h, valid_w)
    om = _om(i, h_tile, W, valid_h, valid_w, cdt)
    v = v * om
    u = v * gate[0]
    y = _project(wp, u)  # C2-channel: fp32
    ybar = ((y - m2[:]) * inv2[:]).astype(cdt)
    dyhat = (gm[0] * delta[pl.program_id(0), 0].astype(gm.dtype)).astype(cdt)

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


def _b2_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, gm, k, we,
               m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp, m2, inv2, g2,
               alpha2, beta2r, ds_hw, delta, r1_out, dwp_out, taps_out):
    """bn1-backward terms, dWp, and the 9-tap dK correlation sums.

    r1_out (E, 1, 2): [sum db1h, sum db1h*dbar]
    dwp_out (E, C2): sum u (x) dy
    taps_out (E, 1, 27): [sum_tap w, sum_tap w*dbar, sum_tap w*db1h] x 9 taps
    """
    i = pl.program_id(1)
    w, d, dhat, v = _recompute_to_v(cdt, expand, xm, xt, xb, k, we, m0, inv0, g0,
                                    b0,
                                    m1, inv1, g1, b1, i, n_tiles, h_tile, W,
                                    valid_h, valid_w)
    om = _om(i, h_tile, W, valid_h, valid_w, cdt)
    u = v * om * gate[0]
    y = _project(wp, u)  # C2-channel: fp32
    ybar = (y - m2[:]) * inv2[:]
    dyhat = gm[0].astype(jnp.float32) * delta[pl.program_id(0), 0]
    dy = ((g2[:] * inv2[:]) * dyhat - alpha2[:] - ybar * beta2r[:]).astype(cdt)
    du = _project(wp, dy, transpose=True, out_dtype=cdt)
    dv = (du * gate[0] + ds_hw[0]) * om
    db1h = dv * _dsilu(dhat)
    dbar = (d - m1[:]) * inv1[:]

    @pl.when(_first_step())
    def _():
        r1_out[:] = jnp.zeros_like(r1_out)
        dwp_out[:] = jnp.zeros_like(dwp_out)
        taps_out[:] = jnp.zeros_like(taps_out)

    r1_out[:, :, 0:1] += _csum(db1h)
    r1_out[:, :, 1:2] += _csum(db1h * dbar)
    dwp_out[:, :] += _rowwise_ab(u, dy)
    wpp = jnp.pad(w, ((0, 0), (0, 0), (1, 1)))  # column shifts for the taps
    for a in range(3):
        for b in range(3):
            ws = wpp[:, a: a + h_tile, b: b + W] * om
            j = (3 * a + b) * 3
            taps_out[:, :, j: j + 1] += _csum(ws)
            taps_out[:, :, j + 1: j + 2] += _csum(ws * dbar)
            taps_out[:, :, j + 2: j + 3] += _csum(ws * db1h)


def _chain_to_dz0hat(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt,
                     xb, gm, gt, gb, k, we, m0, inv0, g0, b0, m1, inv1, g1, b1,
                     gate, wp, m2, inv2, g2, alpha2, beta2r, ds_hw, r1a, r1b,
                     delta):
    """Shared B3/B4 recompute: x (2-row halos) -> dd on extended rows ->
    dL/dw = corr(K~, dd); with expand, continue -> dz0hat on the main rows
    (masked to the valid region). Returns (x_main_f32, zbar0 fp32, dz0hat fp32)
    — for expand=False, zbar0 is None and the dz0hat slot carries the masked
    dL/dx chain term (= corr) directly. The wide intermediate chain runs in the
    compute dtype cdt."""
    i = pl.program_id(1)
    xmv = xm[0].astype(cdt)
    # scalar select in fp32 (bf16 arith.select fails to legalize), then narrow
    top_m = jnp.where(i > 0, 1.0, 0.0).astype(cdt)
    bot_m = jnp.where(i < n_tiles - 1, 1.0, 0.0).astype(cdt)
    rows_top = xt[0, :, 6:8, :].astype(cdt) * top_m
    rows_bot = xb[0, :, 0:2, :].astype(cdt) * bot_m
    xfull = jnp.concatenate([rows_top, xmv, rows_bot], axis=1)  # (C, hT+4, W)

    # w on rows [-2, hT+2), masked to the valid image
    w4 = _w_tile(cdt, expand, xfull, we, m0, inv0, g0, b0, i, h_tile, valid_h,
                 valid_w)
    # d on output rows [-1, hT+1); column shifts from an internal zero pad
    h_ext = h_tile + 2
    w4p = jnp.pad(w4, ((0, 0), (0, 0), (1, 1)))
    d_ext = None
    for a in range(3):
        for b in range(3):
            tap = k[:, 3 * a + b: 3 * a + b + 1, :]
            term = (w4p[:, a: a + h_ext, b: b + W] * tap).astype(jnp.float32)
            d_ext = term if d_ext is None else d_ext + term
    d_ext = d_ext.astype(cdt)
    dhat_ext = _bnv(d_ext, m1, inv1, g1, b1)
    v_ext = _silu(dhat_ext)
    om_ext = _om(i, h_tile, W, valid_h, valid_w, cdt, rows=h_ext, off=1)
    v_ext = v_ext * om_ext

    g_top = gt[0, :, 7:8, :].astype(cdt) * top_m
    g_bot = gb[0, :, 0:1, :].astype(cdt) * bot_m
    g_ext = jnp.concatenate([g_top, gm[0].astype(cdt), g_bot], axis=1)

    u_ext = v_ext * gate[0]
    y_ext = _project(wp, u_ext)  # C2-channel: fp32
    ybar_ext = (y_ext - m2[:]) * inv2[:]
    dyhat_ext = g_ext.astype(jnp.float32) * delta[pl.program_id(0), 0]
    dy_ext = ((g2[:] * inv2[:]) * dyhat_ext - alpha2[:]
              - ybar_ext * beta2r[:]).astype(cdt)
    du_ext = _project(wp, dy_ext, transpose=True, out_dtype=cdt)
    dv_ext = (du_ext * gate[0] + ds_hw[0]) * om_ext
    db1h_ext = dv_ext * _dsilu(dhat_ext)
    dbar_ext = (d_ext - m1[:]) * inv1[:]
    dd_ext = (g1[:] * inv1[:]) * db1h_ext - r1a[:] - dbar_ext * r1b[:]
    dd_ext = dd_ext * om_ext  # bn affine terms are nonzero outside the image
    dd_pad = jnp.pad(dd_ext, ((0, 0), (0, 0), (1, 1)))  # (E, hT+2, W+2)

    # dL/dw = correlation with the 180-degree-flipped kernel (fp32 accumulate)
    dwact = None
    for a in range(3):
        for b in range(3):
            tap = k[:, 3 * a + b: 3 * a + b + 1, :]
            term = (dd_pad[:, (2 - a): (2 - a) + h_tile,
                           (2 - b): (2 - b) + W] * tap).astype(jnp.float32)
            dwact = term if dwact is None else dwact + term
    # w was force-zeroed outside the valid image — its gradient stops there
    # (for expand=False, w IS x and corr is already dL/dx on the valid region)
    im = _om(i, h_tile, W, valid_h, valid_w)
    if not expand:
        return xmv.astype(jnp.float32), None, dwact * im
    z_main = _project(we, xmv)  # fp32: feeds the bn0-backward statistics
    m0f, inv0f = m0[:].astype(jnp.float32), inv0[:].astype(jnp.float32)
    zbar0 = (z_main - m0f) * inv0f
    zhat0 = zbar0 * g0[:].astype(jnp.float32) + b0[:].astype(jnp.float32)
    dz0hat = dwact * _dsilu(zhat0) * im
    return xmv.astype(jnp.float32), zbar0, dz0hat


def _b3_kernel(cdt, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, gm, gt,
               gb, k, we, m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp, m2,
               inv2, g2, alpha2, beta2r, ds_hw, r1a, r1b, delta, rz_out, t3_out):
    """bn0-backward terms and T3 = sum(x (x) dz0hat) for the analytic dWe
    (expanding blocks only)."""
    xmv, zbar0, dz0hat = _chain_to_dz0hat(
        cdt, True, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, gm, gt,
        gb, k, we, m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp, m2, inv2, g2,
        alpha2, beta2r, ds_hw, r1a, r1b, delta)

    @pl.when(_first_step())
    def _():
        rz_out[:] = jnp.zeros_like(rz_out)
        t3_out[:] = jnp.zeros_like(t3_out)

    rz_out[:, :, 0:1] += _csum(dz0hat)
    rz_out[:, :, 1:2] += _csum(dz0hat * zbar0)
    t3_out[:, :] += _rowwise_ab(xmv, dz0hat)


def _b4_kernel(cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, residual, xm,
               xt, xb, gm, gt, gb, k, we, m0, inv0, g0, b0, m1, inv1, g1, b1,
               gate, wp, m2, inv2, g2, alpha2, beta2r, ds_hw, r1a, r1b, alpha0,
               beta0r, delta, dx_out):
    """dx = ([G +] We dz) * mask with dz the exact bn0 backward (expanding), or
    dx = [G +] corr directly (e=1); zero pads out (the previous block's
    cotangent contract)."""
    _, zbar0, dz0hat = _chain_to_dz0hat(
        cdt, expand, n_tiles, h_tile, W, valid_h, valid_w, xm, xt, xb, gm, gt,
        gb, k, we, m0, inv0, g0, b0, m1, inv1, g1, b1, gate, wp, m2, inv2, g2,
        alpha2, beta2r, ds_hw, r1a, r1b, delta)
    if expand:
        g0f, inv0f = g0[:].astype(jnp.float32), inv0[:].astype(jnp.float32)
        dz = ((g0f * inv0f) * dz0hat - alpha0[:].astype(jnp.float32)
              - zbar0 * beta0r[:].astype(jnp.float32)).astype(cdt)
        dx = _project(we, dz, transpose=True)  # (C, hT, W) fp32
    else:
        dx = dz0hat  # already the masked chain term
    i = pl.program_id(1)
    om = _om(i, h_tile, W, valid_h, valid_w)
    if residual:
        dx = dx + gm[0].astype(jnp.float32)
    dx_out[0] = (dx * om).astype(dx_out.dtype)


# --------------------------------------------------------------------------------
# host-side (traced) glue
# --------------------------------------------------------------------------------


VMEM_BUDGET = 80 * 2 ** 20  # scoped-vmem stack limit is ~114M; leave headroom


def _tile_budget_bytes(e: int, t: int, w: int, itemsize: int) -> int:
    """Estimated peak VMEM of the heaviest (B3/B4) kernel at tile height t:
    ~15 live compute-dtype extended-row tiles at their PADDED shapes (rows to
    the 8-sublane tile incl. the +4 halo, lanes to 128 incl. the +2 stencil
    pad). Calibrated against a measured 115.8M at E=240/t=8/W=384/fp32."""
    rows_padded = -(-(t + 4) // 8) * 8
    lanes_padded = w + 128
    return 15 * e * rows_padded * lanes_padded * itemsize


def _pick_h_tile(H: int, E: int, W: int, itemsize: int = 4) -> int:
    for t in (24, 16, 8):
        if H % t == 0 and _tile_budget_bytes(E, t, W, itemsize) <= VMEM_BUDGET:
            return t
    raise ValueError(
        f"no tile height fits H={H}, E={E}, W={W} under the VMEM budget")


def pick_h_pad(h: int, e: int, w: int, itemsize: int = 2) -> int:
    """Padded height the integration should use: smallest multiple of the
    largest budget-feasible tile (so the kernel's _pick_h_tile selects that
    same tile). ``w`` is the PADDED width; ``itemsize`` the activation dtype's."""
    for t in (24, 16, 8):
        if _tile_budget_bytes(e, t, w, itemsize) <= VMEM_BUDGET:
            return -(-h // t) * t
    raise ValueError(f"expanded width E={e} too large for the fused kernel at W={w}")


def pick_w_pad(w: int) -> int:
    """Padded width: the 128-lane tile multiple (row merges become reshapes)."""
    return -(-w // 128) * 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_mbconv_e6(x, params, delta, valid_h: int, valid_w: int,
                    eps: float = BN_EPS, interpret: bool = False):
    """x: (N, C, Hpad, Wpad) with the pad region ZERO (rows >= valid_h, cols >=
    valid_w); Hpad % 8 == 0. On TPU, Wpad must be a multiple of 128 (see
    pick_w_pad); interpret mode accepts any width.

    params selects the block form: MBConv6Params runs the full expanding chain;
    MBConvParams (ops/mbconv_pallas) runs the e=1 form (depthwise directly on
    x — no expand conv / bn0, one fewer forward and backward pass).

    Returns (out (N, C2, Hpad, Wpad), stats) with the pad region of out ZERO,
    so fused blocks chain without re-padding; stats is (mean0, var0, mean1,
    var1, mean2, var2) for expanding blocks, (mean1, var1, mean2, var2) for
    e=1 blocks."""
    out, stats, _ = _forward(x, params, delta, valid_h, valid_w, eps, interpret)
    return out, stats


def _common_specs(p, N, C, E, C2, W, cdt):
    wespec = pl.BlockSpec((C, E), lambda n, i: (0, 0), memory_space=pltpu.VMEM)
    wpspec = pl.BlockSpec((E, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((E, 9, W), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM)
    k = jnp.broadcast_to(p.dw_kernel.astype(cdt).reshape(E, 9, 1), (E, 9, W))
    gate_spec = pl.BlockSpec((1, E, 1, W), lambda n, i: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((N, 1), lambda n, i: (0, 0), memory_space=pltpu.SMEM)
    return wespec, wpspec, kspec, k, gate_spec, dspec


def _forward(x, p, delta, valid_h, valid_w, eps, interpret):
    expand = isinstance(p, MBConv6Params)
    N, C, H, W = x.shape
    E = p.we.shape[1] if expand else C
    C2 = p.wp.shape[1]
    residual = C2 == C
    assert 0 < valid_h <= H and 0 < valid_w <= W
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    h_tile = _pick_h_tile(H, E, W, jnp.dtype(cdt).itemsize)
    n_tiles, halo = _halo_specs(C, h_tile, W, H)
    grid = (N, n_tiles)
    n = N * valid_h * valid_w
    wespec, wpspec, kspec, k, gate_spec, dspec = _common_specs(p, N, C, E, C2, W, cdt)
    # host-side analytics use the SAME rounded weights the kernels compute with
    wp = p.wp.astype(cdt).astype(jnp.float32)
    wp_k = wp.astype(cdt)
    vecE = _vec_spec(E, W)
    vecC2 = _vec_spec(C2, W)

    if expand:
        we = p.we.astype(cdt).astype(jnp.float32)
        we_k = we.astype(cdt)

        # ---- P1: x moments -> bn0 stats analytically (z = x We)
        sx, sxx = _grid_call(
            _p1_kernel,
            grid=grid,
            in_specs=[halo[0]],
            out_shape=(
                jax.ShapeDtypeStruct((C, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((C, C), jnp.float32),
            ),
            out_specs=(
                pl.BlockSpec((C, 1, 1), lambda n, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(x)
        sx_v = sx[:, 0, 0]  # (C,)
        mean0 = sx_v @ we / n
        ey2 = jnp.einsum("ce,cd,de->e", we, sxx, we) / n
        var0 = jnp.maximum(ey2 - mean0 * mean0, 0.0)
        inv0 = jax.lax.rsqrt(var0 + eps)
        m0v, inv0v, g0v, b0v = _channel_vecs(W, mean0, inv0, p.gamma0, p.beta0,
                                             dtype=cdt)
    else:
        # the e=1 form has no expand conv: the refs are never read in-kernel,
        # but pallas needs real (tiny) operands
        sx_v = jnp.zeros((C,), jnp.float32)
        sxx = jnp.zeros((C, C), jnp.float32)
        mean0 = var0 = jnp.zeros((E,), jnp.float32)
        we_k = jnp.zeros((C, E), cdt)
        zE = jnp.zeros((E,), jnp.float32)
        m0v, inv0v, g0v, b0v = _channel_vecs(W, zE, zE, zE, zE, dtype=cdt)
    vecs0 = [m0v, inv0v, g0v, b0v]

    # ---- P2: bn1 stats
    sums = _grid_call(
        functools.partial(_p2_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w),
        grid=grid,
        in_specs=halo + [kspec, wespec] + [vecE] * 4,
        out_shape=jax.ShapeDtypeStruct((E, 1, 2), jnp.float32),
        out_specs=pl.BlockSpec((E, 1, 2), lambda n, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, k, we_k, *vecs0)
    mean1 = sums[:, 0, 0] / n
    var1 = jnp.maximum(sums[:, 0, 1] / n - mean1 * mean1, 0.0)
    inv1 = jax.lax.rsqrt(var1 + eps)
    m1v, inv1v, g1v, b1v = _channel_vecs(W, mean1, inv1, p.gamma1, p.beta1,
                                         dtype=cdt)
    vecs1 = [m1v, inv1v, g1v, b1v]

    # ---- P3: SE squeeze
    s_sum = _grid_call(
        functools.partial(_p3_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w),
        grid=grid,
        in_specs=halo + [kspec, wespec] + [vecE] * 8,
        out_shape=jax.ShapeDtypeStruct((N, E, 1, 1), jnp.float32),
        out_specs=pl.BlockSpec((1, E, 1, 1), lambda n, i: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, k, we_k, *vecs0, *vecs1)
    s_sum = s_sum[:, :, 0, 0]
    hw = valid_h * valid_w
    s_mean = s_sum / hw
    gate, _ = _se_gate(s_mean, p)  # (N, E)
    gate_rows = jnp.broadcast_to(
        gate.reshape(N, E, 1, 1).astype(cdt), (N, E, 1, W))
    delta_rows = delta.reshape(N, 1).astype(jnp.float32)

    # ---- P4: bn2 stats (direct reduction — y is only C2 channels wide)
    r_y = _grid_call(
        functools.partial(_p4_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w),
        grid=grid,
        in_specs=halo + [kspec, wespec] + [vecE] * 8 + [gate_spec, wpspec],
        out_shape=jax.ShapeDtypeStruct((C2, 1, 2), jnp.float32),
        out_specs=pl.BlockSpec((C2, 1, 2), lambda n, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, k, we_k, *vecs0, *vecs1, gate_rows, wp_k)
    mean2 = r_y[:, 0, 0] / n
    var2 = jnp.maximum(r_y[:, 0, 1] / n - mean2 * mean2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + eps)
    m2v, inv2v, g2v, b2v = _channel_vecs(W, mean2, inv2, p.gamma2, p.beta2,
                                         dtype=cdt)

    # ---- P5: apply + write
    out = _grid_call(
        functools.partial(_p5_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w, residual),
        grid=grid,
        in_specs=halo + [kspec, wespec] + [vecE] * 8 +
        [gate_spec, wpspec] + [vecC2] * 4 + [dspec],
        out_shape=jax.ShapeDtypeStruct((N, C2, H, W), x.dtype),
        out_specs=pl.BlockSpec((1, C2, h_tile, W), lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, k, we_k, *vecs0, *vecs1, gate_rows, wp_k, m2v, inv2v, g2v,
      b2v, delta_rows)

    saved = (x, delta, sx_v, sxx, mean0, var0, mean1, var1, mean2, var2,
             s_mean, gate)
    stats = (mean0, var0, mean1, var1, mean2, var2) if expand else \
        (mean1, var1, mean2, var2)
    return out, stats, saved


def _fwd(x, params, delta, valid_h, valid_w, eps, interpret):
    out, stats, saved = _forward(x, params, delta, valid_h, valid_w, eps, interpret)
    return (out, stats), (saved, params)


def _bwd(valid_h, valid_w, eps, interpret, res, cot):
    (x, delta, sx_v, sxx, mean0, var0, mean1, var1, mean2, var2,
     s_mean, gate), p = res
    g_out, _ = cot  # stats cotangent ignored (they feed running averages)
    expand = isinstance(p, MBConv6Params)
    N, C, H, W = x.shape
    E = p.we.shape[1] if expand else C
    C2 = p.wp.shape[1]
    residual = C2 == C
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    h_tile = _pick_h_tile(H, E, W, jnp.dtype(cdt).itemsize)
    n_tiles, halo = _halo_specs(C, h_tile, W, H)
    grid = (N, n_tiles)
    n = N * valid_h * valid_w
    hw = valid_h * valid_w
    wespec, wpspec, kspec, k, gate_spec, dspec = _common_specs(p, N, C, E, C2, W, cdt)
    wp = p.wp.astype(cdt).astype(jnp.float32)
    wp_k = wp.astype(cdt)
    inv1 = jax.lax.rsqrt(var1 + eps)
    inv2 = jax.lax.rsqrt(var2 + eps)
    vecE = _vec_spec(E, W)
    vecC2 = _vec_spec(C2, W)
    if expand:
        we = p.we.astype(cdt).astype(jnp.float32)
        we_k = we.astype(cdt)
        inv0 = jax.lax.rsqrt(var0 + eps)
        m0v, inv0v, g0v, b0v = _channel_vecs(W, mean0, inv0, p.gamma0, p.beta0,
                                             dtype=cdt)
    else:
        we_k = jnp.zeros((C, E), cdt)
        zE = jnp.zeros((E,), jnp.float32)
        m0v, inv0v, g0v, b0v = _channel_vecs(W, zE, zE, zE, zE, dtype=cdt)
    vecs0 = [m0v, inv0v, g0v, b0v]
    m1v, inv1v, g1v, b1v = _channel_vecs(W, mean1, inv1, p.gamma1, p.beta1,
                                         dtype=cdt)
    vecs1 = [m1v, inv1v, g1v, b1v]
    m2v, inv2v, g2v, _ = _channel_vecs(W, mean2, inv2, p.gamma2, p.beta2,
                                       dtype=cdt)
    gate_rows = jnp.broadcast_to(
        gate.reshape(N, E, 1, 1).astype(cdt), (N, E, 1, W))
    delta_rows = delta.reshape(N, 1).astype(jnp.float32)
    gspec_main = pl.BlockSpec((1, C2, h_tile, W), lambda n, i: (n, 0, i, 0),
                              memory_space=pltpu.VMEM)

    # ---- B1: bn2 backward terms + SE bilinear matrices
    r2, t1, t2 = _grid_call(
        functools.partial(_b1_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w),
        grid=grid,
        in_specs=halo + [gspec_main, kspec, wespec] + [vecE] * 8 +
        [gate_spec, wpspec, vecC2, vecC2, dspec],
        out_shape=(
            jax.ShapeDtypeStruct((C2, 1, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, E, C2), jnp.float32),
            jax.ShapeDtypeStruct((N, E, C2), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((C2, 1, 2), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, C2), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, C2), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, x, x, g_out, k, we_k, *vecs0, *vecs1, gate_rows, wp_k, m2v, inv2v,
      delta_rows)

    r2_0 = r2[:, 0, 0]
    r2_1 = r2[:, 0, 1]
    dgamma2 = r2_1
    dbeta2 = r2_0
    alpha2 = p.gamma2 * inv2 * r2_0 / n
    beta2r = p.gamma2 * inv2 * r2_1 / n

    # SE backward from the bilinear matrices (dy is affine in dyhat)
    s_sum = s_mean * hw
    dg = (
        jnp.einsum("ec,c,nec->ne", wp, p.gamma2 * inv2, t1)
        - jnp.einsum("ec,c->e", wp, alpha2)[None, :] * s_sum
        - jnp.einsum("ec,c,nec->ne", wp, beta2r, t2)
    )
    _, (z1, a1, z2) = _se_gate(s_mean, p)
    sig2 = jax.nn.sigmoid(z2)
    dz2 = dg * sig2 * (1.0 - sig2)
    dse_w2 = jnp.einsum("ns,ne->se", a1, dz2)
    dse_b2 = jnp.sum(dz2, axis=0)
    da1 = dz2 @ p.se_w2.T
    dz1 = da1 * _dsilu(z1)
    dse_w1 = jnp.einsum("ne,ns->es", s_mean, dz1)
    dse_b1 = jnp.sum(dz1, axis=0)
    ds = dz1 @ p.se_w1.T  # (N, E): dL/ds_mean
    ds_hw = jnp.broadcast_to(
        (ds / hw).reshape(N, E, 1, 1).astype(cdt), (N, E, 1, W))
    alpha2v, beta2v = _channel_vecs(W, alpha2, beta2r, dtype=cdt)

    # ---- B2: bn1 backward terms + dWp + dK taps
    r1, dwp, taps = _grid_call(
        functools.partial(_b2_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w),
        grid=grid,
        in_specs=halo + [gspec_main, kspec, wespec] + [vecE] * 8 +
        [gate_spec, wpspec, vecC2, vecC2, vecC2, vecC2, vecC2, gate_spec, dspec],
        out_shape=(
            jax.ShapeDtypeStruct((E, 1, 2), jnp.float32),
            jax.ShapeDtypeStruct((E, C2), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, 27), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((E, 1, 2), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C2), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1, 27), lambda n, i: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, x, x, g_out, k, we_k, *vecs0, *vecs1, gate_rows, wp_k, m2v, inv2v,
      g2v, alpha2v, beta2v, ds_hw, delta_rows)

    r1_0 = r1[:, 0, 0]
    r1_1 = r1[:, 0, 1]
    dgamma1 = r1_1
    dbeta1 = r1_0
    r1a = p.gamma1 * inv1 * r1_0 / n
    r1b = p.gamma1 * inv1 * r1_1 / n
    t = taps[:, 0, :].reshape(E, 9, 3)
    dk = (
        (p.gamma1 * inv1)[:, None] * t[:, :, 2]
        - r1a[:, None] * t[:, :, 0]
        - r1b[:, None] * t[:, :, 1]
    )
    ddw = dk.reshape(E, 3, 3)
    r1av, r1bv = _channel_vecs(W, r1a, r1b, dtype=cdt)

    # B3/B4 halo specs: 2 x-rows and 1 G-row served by 8-row neighbor blocks
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

    # ---- B3: bn0 backward terms + T3 (expanding blocks only)
    if expand:
        rz, t3 = _grid_call(
            functools.partial(_b3_kernel, cdt, n_tiles, h_tile, W, valid_h,
                              valid_w),
            grid=grid,
            in_specs=[xm, xt2, xb2, gspec_main, gt, gb, kspec, wespec] +
            [vecE] * 8 + [gate_spec, wpspec, vecC2, vecC2, vecC2, vecC2, vecC2,
                          gate_spec, vecE, vecE, dspec],
            out_shape=(
                jax.ShapeDtypeStruct((E, 1, 2), jnp.float32),
                jax.ShapeDtypeStruct((C, E), jnp.float32),
            ),
            out_specs=(
                pl.BlockSpec((E, 1, 2), lambda n, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, E), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(x, x, x, g_out, g_out, g_out, k, we_k, *vecs0, *vecs1, gate_rows, wp_k,
          m2v, inv2v, g2v, alpha2v, beta2v, ds_hw, r1av, r1bv, delta_rows)

        rz_0 = rz[:, 0, 0]
        rz_1 = rz[:, 0, 1]
        dgamma0 = rz_1
        dbeta0 = rz_0
        alpha0 = p.gamma0 * inv0 * rz_0 / n
        beta0r = p.gamma0 * inv0 * rz_1 / n
        # dWe analytically from T3 and the P1 moments:
        #   dWe = T3 diag(g0 inv0) - sx (x) alpha0 - [sum x (x) zbar] diag(beta0r)
        #   sum x (x) zbar = diag-scaled (S We - sx (x) mu0)
        sxz = sxx @ we - sx_v[:, None] * mean0[None, :]  # sum x (x) (z - mu0)
        dwe = (
            t3 * (p.gamma0 * inv0)[None, :]
            - sx_v[:, None] * alpha0[None, :]
            - sxz * (inv0 * beta0r)[None, :]
        )

    else:
        alpha0 = beta0r = jnp.zeros((E,), jnp.float32)
    alpha0v, beta0rv = _channel_vecs(W, alpha0, beta0r)  # fp32: used in fp32 dz

    # ---- B4: dx
    dx = _grid_call(
        functools.partial(_b4_kernel, cdt, expand, n_tiles, h_tile, W, valid_h,
                          valid_w, residual),
        grid=grid,
        in_specs=[xm, xt2, xb2, gspec_main, gt, gb, kspec, wespec] +
        [vecE] * 8 + [gate_spec, wpspec, vecC2, vecC2, vecC2, vecC2, vecC2,
                      gate_spec, vecE, vecE, vecE, vecE, dspec],
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), x.dtype),
        out_specs=pl.BlockSpec((1, C, h_tile, W), lambda n, i: (n, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, x, g_out, g_out, g_out, k, we_k, *vecs0, *vecs1, gate_rows, wp_k,
      m2v, inv2v, g2v, alpha2v, beta2v, ds_hw, r1av, r1bv, alpha0v, beta0rv,
      delta_rows)

    common = dict(
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
    if expand:
        dparams = MBConv6Params(
            we=dwe.astype(p.we.dtype),
            gamma0=dgamma0.astype(p.gamma0.dtype),
            beta0=dbeta0.astype(p.beta0.dtype),
            **common,
        )
    else:
        dparams = MBConvParams(**common)
    ddelta = jnp.zeros_like(delta)
    return dx, dparams, ddelta


fused_mbconv_e6.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------------
# pure-JAX reference (same math, unfused) — used by tests and as documentation
# --------------------------------------------------------------------------------


def mbconv_e6_reference(x, p: MBConv6Params, delta, eps: float = BN_EPS):
    """Unfused NCHW reference of the identical block math (train-mode BN).
    Operates on the exact (unpadded) image; no alignment requirements."""
    xf = x.astype(jnp.float32)
    we = p.we.astype(jnp.float32)
    z = jnp.einsum("nchw,ce->nehw", xf, we)
    mean0 = jnp.mean(z, axis=(0, 2, 3))
    var0 = jnp.maximum(jnp.mean(z * z, axis=(0, 2, 3)) - mean0 ** 2, 0.0)
    zhat = (z - mean0[:, None, None]) * jax.lax.rsqrt(var0 + eps)[:, None, None]
    zhat = zhat * p.gamma0[:, None, None] + p.beta0[:, None, None]
    w = _silu(zhat)
    kk = p.dw_kernel.astype(jnp.float32)  # (E, 3, 3)
    d = jax.lax.conv_general_dilated(
        w, kk[:, None].transpose(2, 3, 1, 0), (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=w.shape[1],
    )
    mean1 = jnp.mean(d, axis=(0, 2, 3))
    var1 = jnp.maximum(jnp.mean(d * d, axis=(0, 2, 3)) - mean1 ** 2, 0.0)
    dhat = (d - mean1[:, None, None]) * jax.lax.rsqrt(var1 + eps)[:, None, None]
    dhat = dhat * p.gamma1[:, None, None] + p.beta1[:, None, None]
    v = _silu(dhat)
    s = jnp.mean(v, axis=(2, 3))
    gate, _ = _se_gate(s, p)
    u = v * gate[:, :, None, None]
    y = jnp.einsum("nehw,ec->nchw", u, p.wp.astype(jnp.float32))
    mean2 = jnp.mean(y, axis=(0, 2, 3))
    var2 = jnp.maximum(jnp.mean(y * y, axis=(0, 2, 3)) - mean2 ** 2, 0.0)
    yhat = (y - mean2[:, None, None]) * jax.lax.rsqrt(var2 + eps)[:, None, None]
    yhat = yhat * p.gamma2[:, None, None] + p.beta2[:, None, None]
    out = delta[:, None, None, None] * yhat
    if p.wp.shape[1] == x.shape[1]:
        out = out + xf
    return out.astype(x.dtype), (mean0, var0, mean1, var1, mean2, var2)
