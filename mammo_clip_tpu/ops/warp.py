"""MXU/VPU-native affine+elastic image warp (two-pass, gather-free).

XLA's general gather lowers to scalar address generation on TPU (~16 ns/element
measured on this pod: a 4-tap bilinear warp of a 4x1520x912 batch costs ~250 ms —
half the CLIP train step). This module reformulates the warp so the hot work runs on
the MXU/VPU instead of the scalar unit.

Catmull–Smith two-pass decomposition. For the inverse map
``src = M @ (x, y, 1)`` (rows: xs = m00 x + m01 y + m02; ys = m10 x + m11 y + m12):

  pass V:  I[w, x]  = S[ q*w + p*x + r + dy(w, x), x ]
  pass H:  T[y, x]  = I[ y, m00*x + m01*y + m02 + dx(y, x) ]

with p = m10/m00, q = m11 - m10*m01/m00, r = m12 - m10*m02/m00 — exact for affines
while |m00| is bounded away from 0 (rotation+shear <= ~45 deg; the reference augments
within +-20 deg, configs/transform/clahe.yaml:5-12).

Each 1-D pass ``target(o, x) = alpha*o + beta*x + gamma + d(o, x)`` runs as:

  1. per-column-block integer base shift round(beta * x_center): one dynamic_slice
     per 64-wide lane block out of a zero-padded source (contiguous copies, no gather);
  2. residual (beta*x - base + d + fraction) via SHIFTED-COPIES select-accumulate
     over a static window [-K, K] — pure VPU select/FMA on contiguous slices
     (~3 ms for K=64 at 4x1520x912, measured);
  3. alpha-scaling + gamma translation as a per-sample (H_out, H_in) tent-weight
     matrix on the MXU (einsum); flips ride through as alpha < 0.

Steps 2+3 chain two linear interpolations along the pass axis (bilinear-of-bilinear):
marginally smoother than direct 2D bilinear, exact for flips/integer translations,
statistically equivalent as augmentation (see tests/test_warp.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _tent_matrix(alpha, gamma, h_out: int, h_in: int) -> jnp.ndarray:
    """(h_out, h_in) bilinear weights: output row o samples input row alpha*o + gamma.
    Targets outside [0, h_in) produce all-zero rows -> background fill."""
    o = jnp.arange(h_out, dtype=jnp.float32)
    target = alpha * o + gamma
    i = jnp.arange(h_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(i[None, :] - target[:, None]))


def _pass_1d(
    src_pad: jnp.ndarray,  # (Hs, W): original H0 rows zero-padded by M on both sides
    alpha, beta, gamma,  # per-sample scalars; gamma in ORIGINAL source coords
    disp: Optional[jnp.ndarray],  # (Hi, W) elastic displacement aligned to the slab
    h_out: int,
    h0: int,  # original (unpadded) source height
    margin: int,  # M: rows of zero padding on each side of src_pad
    inner: int,  # Mi: slab margin (k_half + 2)
    block: int,
    k_half: int,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """out[o, x] ~ src[alpha*o + beta*x + gamma + disp, x] with background 0."""
    Hs, W = src_pad.shape
    nb = W // block
    Hi = h0 + 2 * inner

    # ---- step 1: per-block integer base shifts (contiguous dynamic slices) ----------
    x_centers = (jnp.arange(nb, dtype=jnp.float32) + 0.5) * block
    bases = jnp.round(beta * x_centers)  # (nb,)
    src_blocks = jnp.transpose(src_pad.reshape(Hs, nb, block), (1, 0, 2))  # (nb, Hs, blk)
    starts = (margin - inner + bases).astype(jnp.int32)
    slabs = jax.vmap(
        lambda blk, st: jax.lax.dynamic_slice(blk, (st, 0), (Hi, block))
    )(src_blocks, starts)  # (nb, Hi, block)
    slab = jnp.transpose(slabs, (1, 0, 2)).reshape(Hi, W)
    # slab[i, x] = src[(i - inner) + base(x)]  in original source row coords

    # ---- step 2: shifted-copies residual interpolation ------------------------------
    x = jnp.arange(W, dtype=jnp.float32)
    base_per_x = jnp.repeat(bases, block)
    resid = beta * x - base_per_x  # (W,) in [-k_half, k_half] minus disp slack
    target = resid[None, :] + (disp if disp is not None else jnp.zeros((1, 1), jnp.float32))
    t_floor = jnp.floor(target)
    frac = (target - t_floor).astype(jnp.float32)
    t_int = t_floor.astype(jnp.int32)

    slab_pad = jnp.pad(slab, ((k_half + 1, k_half + 1), (0, 0))).astype(compute_dtype)
    frac16 = frac.astype(compute_dtype)

    # fori_loop keeps the HLO small (a fully unrolled 2K+1-step sweep compiles for
    # tens of minutes on the remote-compile TPU toolchain) while unroll=8 lets XLA
    # fuse groups of iterations so the accumulator isn't round-tripped through HBM
    # every step (profiled: the unfused loop was ~13% of the whole train step).
    # bf16 slab/acc halve the loop's HBM traffic; each output mixes only 2 taps, so
    # bf16 accumulation loses no visible precision for augmentation.
    def body(s_idx, acc):
        s = s_idx - k_half
        shifted = jax.lax.dynamic_slice_in_dim(slab_pad, s_idx + 1, Hi, axis=0)
        zero = jnp.zeros((), compute_dtype)
        w = jnp.where(t_int == s, 1 - frac16, zero) + jnp.where(t_int == s - 1, frac16, zero)
        return acc + shifted * w

    acc = jax.lax.fori_loop(
        0, 2 * k_half + 1, body, jnp.zeros((Hi, W), compute_dtype), unroll=8
    ).astype(jnp.float32)
    # acc[i, x] = src[(i - inner) + beta*x + disp(i, x)]

    # ---- step 3: alpha scale + gamma translate on the MXU ---------------------------
    m = _tent_matrix(alpha, gamma + inner, h_out, Hi)
    return jnp.einsum("oi,iw->ow", m, acc, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("beta_max", "disp_max", "block", "compute_dtype"))
def warp_affine_elastic(
    images: jnp.ndarray,  # (B, H, W, 1) float32, background already at 0
    inv_mats: jnp.ndarray,  # (B, 2, 3) dst->src (ops.augment.sample_affine_matrices)
    disp: Optional[jnp.ndarray] = None,  # (B, H, W, 2) elastic displacement (x, y)
    beta_max: float = 0.75,
    disp_max: float = 12.0,
    block: int = 32,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched two-pass warp. ``beta_max`` bounds |m10/m00| and |m01| for the config's
    rotate/shear/scale ranges; ``disp_max`` bounds |elastic|. Static -> fixed window.
    Smaller ``block`` = tighter per-block shift window (fewer sweep iterations) at the
    cost of more dynamic slices; 32 balances both at mammogram sizes."""
    B, H, W, C = images.shape
    assert C == 1, "grayscale mammograms"
    Wp = _round_up(W, block)
    Hp = _round_up(H, block)

    k_half = int(math.ceil(beta_max * block / 2 + disp_max + 1.0))
    inner = k_half + 2
    margin_v = int(math.ceil(beta_max * Wp)) + inner + 2  # pass-V bases span beta*x, x<=Wp
    margin_h = int(math.ceil(beta_max * Hp)) + inner + 2

    m00 = inv_mats[:, 0, 0]
    m01 = inv_mats[:, 0, 1]
    m02 = inv_mats[:, 0, 2]
    m10 = inv_mats[:, 1, 0]
    m11 = inv_mats[:, 1, 1]
    m12 = inv_mats[:, 1, 2]
    p = m10 / m00
    q = m11 - m10 * m01 / m00
    r = m12 - m10 * m02 / m00

    imgs = jnp.pad(images[..., 0], ((0, 0), (margin_v, margin_v), (0, Wp - W)))

    if disp is not None:
        # pass-V dy aligned to the vertical slab (Hi_v = H + 2*inner rows); edge-pad so
        # border behavior stays smooth
        dy = jnp.pad(disp[..., 1], ((0, 0), (inner, inner), (0, Wp - W)), mode="edge")
        # pass-H dx on the transposed intermediate: slab rows cover x in
        # [-inner, Wp + inner), lanes = y padded to Hp
        dx_t = jnp.transpose(disp[..., 0], (0, 2, 1))
        dx = jnp.pad(dx_t, ((0, 0), (inner, inner + Wp - W), (0, Hp - H)), mode="edge")
    else:
        dy = dx = None

    def per_sample(img_p, dyi, dxi, pi, qi, ri, a00, a01, a02):
        inter = _pass_1d(
            img_p, qi, pi, ri, dyi,
            h_out=H, h0=H, margin=margin_v, inner=inner, block=block, k_half=k_half,
            compute_dtype=compute_dtype,
        )  # (H, Wp)
        inter_t = jnp.transpose(inter)  # (Wp, H)
        inter_t = jnp.pad(inter_t, ((margin_h, margin_h), (0, Hp - H)))
        out_t = _pass_1d(
            inter_t, a00, a01, a02, dxi,
            h_out=W, h0=Wp, margin=margin_h, inner=inner, block=block, k_half=k_half,
            compute_dtype=compute_dtype,
        )  # (W, Hp)
        return jnp.transpose(out_t[:, :H])  # (H, W)

    if disp is None:
        out = jax.vmap(
            lambda img_p, pi, qi, ri, a00, a01, a02: per_sample(
                img_p, None, None, pi, qi, ri, a00, a01, a02
            )
        )(imgs, p, q, r, m00, m01, m02)
    else:
        out = jax.vmap(per_sample)(imgs, dy, dx, p, q, r, m00, m01, m02)
    return out[..., None]
