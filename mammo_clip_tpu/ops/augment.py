"""Fused on-device augmentation + normalization.

Replaces the reference's CPU-side albumentations pipeline — HorizontalFlip, VerticalFlip,
Affine(rotate ±20°, translate ±10%, scale 0.8–1.2, shear ±20°), ElasticTransform(α=10,
σ=15), each applied with probability 0.5 (reference: breastclip/data/data_utils.py:28-62,
params configs/transform/clahe.yaml:5-12) — and the per-image min-max + mean/std
normalization (imagetext.py:131-134).

Why on-device: the reference runs augmentation synchronously on the training process
(num_workers=0, configs/dataloader/dataloader_b5.yaml:5) and it dominates step time at
1520x912. Here the whole pipeline compiles INTO the train step:

* flips and the affine transform are composed into ONE per-sample 2x3 inverse matrix;
* the elastic displacement field is synthesized at 1/8 resolution (uniform noise ->
  separable Gaussian blur at sigma/8 -> bilinear upsample), spectrally equivalent to
  full-res blurring at sigma but 64x cheaper;
* affine coords + elastic displacement feed a SINGLE bilinear gather per image, so each
  pixel is resampled exactly once regardless of how many ops are enabled;
* everything is batched (B,H,W,C) and driven by per-sample PRNG keys, so the same
  compiled program serves every step.

Parity note: albumentations samples each transform's parameters from symmetric ranges
and applies each op with p=0.5; we reproduce those distributions. Pixel-level equality
with OpenCV resampling is not a goal (quality parity is judged statistically on final
AUC, SURVEY.md §7 "hard parts" #2).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    hflip_p: float = 0.5
    vflip_p: float = 0.5
    affine_p: float = 0.5
    rotate_deg: float = 20.0
    translate_frac: float = 0.1
    scale_min: float = 0.8
    scale_max: float = 1.2
    shear_deg: float = 20.0
    elastic_p: float = 0.5
    elastic_alpha: float = 10.0
    elastic_sigma: float = 15.0
    elastic_downsample: int = 8
    elastic_fullres_amp: bool = False  # rescale the 1/d-res field so its std
    #   matches FULL-resolution synthesis (albumentations ElasticTransform
    #   semantics) at the same alpha. Blurred white noise keeps
    #   std ∝ sum(k^2) of the discrete kernel, so synthesizing at 1/d res with
    #   sigma/d carries ~d x the full-res amplitude; at the reference's
    #   alpha=10/sigma=15 that is 0.85 px vs 0.15 px — both sub-pixel
    #   (tests/test_augment.py pins the relation; BASELINE.md r4). Default off
    #   to keep the measured/arm-gated recipes' HLO stable; turn on for exact
    #   reference-distribution augmentation.

    @classmethod
    def from_dict(cls, d: dict) -> "AugmentConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


# ------------------------------------------------------------------------------------
# normalization
# ------------------------------------------------------------------------------------

def minmax_standardize(images: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """Per-image min-max to [0,1] then (x - mean)/std (reference imagetext.py:131-134).

    Accepts uint8 or float input; returns float32.
    """
    x = images.astype(jnp.float32)
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    x = (x - lo) / jnp.maximum(hi - lo, 1e-8)
    return (x - mean) / std


# ------------------------------------------------------------------------------------
# affine machinery
# ------------------------------------------------------------------------------------

def sample_affine_matrices(rng: jax.Array, batch: int, height: int, width: int,
                           cfg: AugmentConfig) -> jnp.ndarray:
    """Per-sample 2x3 INVERSE maps (dst pixel -> src pixel), composing flips + affine.

    The affine is taken about the image center. Returns (B, 2, 3) float32 acting on
    homogeneous (x, y, 1) pixel coordinates.
    """
    ks = jax.random.split(rng, 7)
    u_h = jax.random.uniform(ks[0], (batch,))
    u_v = jax.random.uniform(ks[1], (batch,))
    u_a = jax.random.uniform(ks[2], (batch,))
    hflip = jnp.where(u_h < cfg.hflip_p, -1.0, 1.0)
    vflip = jnp.where(u_v < cfg.vflip_p, -1.0, 1.0)
    apply_affine = (u_a < cfg.affine_p).astype(jnp.float32)

    deg = jnp.pi / 180.0
    theta = jax.random.uniform(ks[3], (batch,), minval=-cfg.rotate_deg, maxval=cfg.rotate_deg) * deg * apply_affine
    shear = jax.random.uniform(ks[4], (batch,), minval=-cfg.shear_deg, maxval=cfg.shear_deg) * deg * apply_affine
    scale = 1.0 + (jax.random.uniform(ks[5], (batch,), minval=cfg.scale_min, maxval=cfg.scale_max) - 1.0) * apply_affine
    trans = jax.random.uniform(ks[6], (batch, 2), minval=-cfg.translate_frac, maxval=cfg.translate_frac)
    trans = trans * apply_affine[:, None] * jnp.asarray([width, height], jnp.float32)

    # forward linear part in skimage's AffineTransform parametrization — the
    # one albumentations.Affine composes (shear is an ANGLE added to the
    # rotation of the y basis column, i.e. an x-axis shear):
    #   [[sx*cos(r), -sy*sin(r+sh)], [sx*sin(r), sy*cos(r+sh)]]
    # (an earlier revision applied [[1,0],[sh,1]] — a y-axis shear — which on
    # portrait mammograms draws a visibly different warp distribution)
    sx, sy = scale * hflip, scale * vflip
    f00 = sx * jnp.cos(theta)
    f01 = -sy * jnp.sin(theta + shear)
    f10 = sx * jnp.sin(theta)
    f11 = sy * jnp.cos(theta + shear)
    # no-op guard: with apply_affine=0 this degrades to pure flip matrices.
    det = f00 * f11 - f01 * f10
    inv00, inv01 = f11 / det, -f01 / det
    inv10, inv11 = -f10 / det, f00 / det

    cx = (width - 1) / 2.0
    cy = (height - 1) / 2.0
    # dst -> src: p_src = F^-1 @ (p_dst - c - t) + c
    tx = -(inv00 * (cx + trans[:, 0]) + inv01 * (cy + trans[:, 1])) + cx
    ty = -(inv10 * (cx + trans[:, 0]) + inv11 * (cy + trans[:, 1])) + cy
    row0 = jnp.stack([inv00, inv01, tx], axis=-1)
    row1 = jnp.stack([inv10, inv11, ty], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def _gaussian_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    return k / jnp.sum(k)


def sample_elastic_lowres(
    rng: jax.Array, batch: int, height: int, width: int, cfg: AugmentConfig
) -> jnp.ndarray:
    """(B, hh, ww, 2) low-res displacement field IN PIXELS (alpha and the per-sample
    p-gate already applied): blurred uniform noise at 1/elastic_downsample resolution.
    Upsample bilinearly for warping, or interpolate at points for box tracking."""
    d = cfg.elastic_downsample
    hh, ww = max(height // d, 2), max(width // d, 2)
    k_noise, k_gate = jax.random.split(rng)
    noise = jax.random.uniform(k_noise, (batch, hh, ww, 2), minval=-1.0, maxval=1.0)
    sigma_low = cfg.elastic_sigma / d
    radius = max(int(3 * sigma_low), 1)
    kern = _gaussian_kernel(sigma_low, radius)
    amp = cfg.elastic_alpha
    if cfg.elastic_fullres_amp:
        # match the FULL-res synthesis amplitude (albumentations semantics):
        # separable blur scales the white-noise std by sum(k^2), so the
        # correction is the ratio of the two discrete kernels' sum(k^2)
        # (trace-time Python floats — see the config field doc)
        import numpy as _np

        kf = _np.asarray(_gaussian_kernel(cfg.elastic_sigma,
                                          max(int(3 * cfg.elastic_sigma), 1)))
        kl = _np.asarray(kern)
        amp = amp * float((kf * kf).sum() / (kl * kl).sum())
    # separable blur via depthwise convs
    noise = jnp.moveaxis(noise, -1, 1).reshape(batch * 2, hh, ww, 1)
    kh = kern.reshape(-1, 1, 1, 1)
    kw = kern.reshape(1, -1, 1, 1)
    blurred = jax.lax.conv_general_dilated(
        noise, kh, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    blurred = jax.lax.conv_general_dilated(
        blurred, kw, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    blurred = blurred.reshape(batch, 2, hh, ww).transpose(0, 2, 3, 1)
    gate = (jax.random.uniform(k_gate, (batch, 1, 1, 1)) < cfg.elastic_p).astype(jnp.float32)
    return blurred * amp * gate


def sample_elastic_displacement(
    rng: jax.Array, batch: int, height: int, width: int, cfg: AugmentConfig
) -> jnp.ndarray:
    """(B, H, W, 2) displacement in pixels: the low-res field bilinearly upsampled
    (spectrally equivalent to full-res blurring at sigma, 64x cheaper)."""
    lowres = sample_elastic_lowres(rng, batch, height, width, cfg)
    return jax.image.resize(lowres, (batch, height, width, 2), method="bilinear")


def elastic_at_points(lowres: jnp.ndarray, points_xy: jnp.ndarray,
                      height: int, width: int) -> jnp.ndarray:
    """Interpolate the low-res displacement field at full-res pixel coords.

    Matches jax.image.resize(..., 'bilinear') half-pixel-center semantics, so the
    value here equals the upsampled field the image warp actually used.
    lowres: (B, hh, ww, 2); points_xy: (B, P, 2) in (x, y) full-res pixels -> (B, P, 2).
    """
    B, hh, ww, _ = lowres.shape
    u = (points_xy[..., 0] + 0.5) * (ww / width) - 0.5  # (B, P) low-res x
    v = (points_xy[..., 1] + 0.5) * (hh / height) - 0.5
    u = jnp.clip(u, 0.0, ww - 1.0)
    v = jnp.clip(v, 0.0, hh - 1.0)
    u0 = jnp.clip(jnp.floor(u), 0, ww - 2) if ww > 1 else jnp.zeros_like(u)
    v0 = jnp.clip(jnp.floor(v), 0, hh - 2) if hh > 1 else jnp.zeros_like(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    flat = lowres.reshape(B, hh * ww, 2)

    def tap(vi, ui):
        idx = (vi * ww + ui).astype(jnp.int32)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    d00 = tap(v0, u0)
    d01 = tap(v0, u0 + 1)
    d10 = tap(v0 + 1, u0)
    d11 = tap(v0 + 1, u0 + 1)
    top = d00 * (1 - fu) + d01 * fu
    bot = d10 * (1 - fu) + d11 * fu
    return top * (1 - fv) + bot * fv


# ------------------------------------------------------------------------------------
# warping
# ------------------------------------------------------------------------------------

def warp_bilinear(images: jnp.ndarray, src_xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample ``images`` (B,H,W,C) at ``src_xy`` (B,H,W,2) pixel coords
    (x, y order). Out-of-range samples read 0 (constant border)."""
    B, H, W, C = images.shape
    x = src_xy[..., 0]
    y = src_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def tap(yy, xx):
        valid = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        idx = (yi * W + xi).reshape(B, H * W)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, C)
        return vals * valid[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def affine_grid(matrices: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Apply per-sample 2x3 maps to the dst pixel grid -> (B,H,W,2) src coords (x,y)."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    return jnp.einsum("bij,hwj->bhwi", matrices, grid)


def warp_bounds(cfg: AugmentConfig) -> Tuple[float, float]:
    """Static (beta_max, disp_max) bounds for ops.warp.warp_affine_elastic, derived by
    sweeping the config's parameter ranges (host-side, trace-time constants)."""
    import itertools
    import numpy as np

    beta = 0.0
    deg = np.pi / 180.0
    for th, sh, sc, hf, vf in itertools.product(
        np.linspace(-cfg.rotate_deg, cfg.rotate_deg, 5) * deg,
        np.linspace(-cfg.shear_deg, cfg.shear_deg, 5) * deg,
        (cfg.scale_min, 1.0, cfg.scale_max),
        (-1.0, 1.0),
        (-1.0, 1.0),
    ):
        cos, sin, t = np.cos(th), np.sin(th), np.tan(sh)
        sx, sy = sc * hf, sc * vf
        f00 = sx * cos - sy * t * sin
        f01 = -sy * sin
        f10 = sx * sin + sy * t * cos
        f11 = sy * cos
        det = f00 * f11 - f01 * f10
        m00, m01 = f11 / det, -f01 / det
        m10 = -f10 / det
        if abs(m00) < 1e-3:
            continue
        beta = max(beta, abs(m10 / m00), abs(m01))
    disp_max = cfg.elastic_alpha + 2.0
    return float(beta * 1.05 + 0.05), float(disp_max)


def augment_batch(
    images: jnp.ndarray,
    rng: jax.Array,
    cfg: AugmentConfig,
    mean: float,
    std: float,
    train: bool = True,
    use_fast_warp: bool = True,
    out_dtype=None,
) -> jnp.ndarray:
    """The fused pipeline: normalize -> (train only) flip+affine+elastic in one warp.

    use_fast_warp selects the MXU two-pass warp (ops/warp.py, ~15x faster than the
    XLA-gather path on TPU); the gather path remains as the reference implementation.

    out_dtype: emit the augmented batch in this dtype (default float32). The
    flagship recipe passes bfloat16 — the encoder casts to bf16 at entry
    anyway, so emitting bf16 here halves the full-res image bytes between the
    warp and the stem (~900 MB/step at bs8 2-view 1520x912) at augmentation-
    noise-level numeric cost.
    """
    out_dtype = out_dtype or jnp.float32
    x = minmax_standardize(images, mean, std)
    if not train:
        return x.astype(out_dtype)
    if max(cfg.hflip_p, cfg.vflip_p, cfg.affine_p, cfg.elastic_p) == 0.0:
        return x.astype(out_dtype)  # statically a no-op pipeline
    B, H, W, _ = x.shape
    k_aff, k_el = jax.random.split(rng)
    mats = sample_affine_matrices(k_aff, B, H, W, cfg)
    disp = sample_elastic_displacement(k_el, B, H, W, cfg) if cfg.elastic_p > 0 else None
    # constant border = background value (the standardized value of black)
    background = (0.0 - mean) / std
    if use_fast_warp:
        from .warp import warp_affine_elastic

        beta_max, disp_max = warp_bounds(cfg)
        # bf16 sweep: halves the warp's HBM traffic; augmentation tolerates bf16
        out = warp_affine_elastic(
            x - background, mats, disp, beta_max=beta_max, disp_max=disp_max,
            compute_dtype=jnp.bfloat16,
        ) + background
        return out.astype(out_dtype)
    coords = affine_grid(mats, H, W)
    if disp is not None:
        coords = coords + disp
    return (warp_bilinear(x - background, coords) + background).astype(out_dtype)


def augment_two_views(
    images: jnp.ndarray,
    views: jnp.ndarray,
    rng: jax.Array,
    cfg: AugmentConfig,
    mean: float,
    std: float,
    train: bool = True,
    out_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment both CLIP views in ONE warp invocation.

    The two-pass warp has per-call fixed costs (shear-sweep setup, displacement
    synthesis dispatches); batching the views halves them. Normalization is per-image,
    and each concatenated sample gets its own PRNG draw, so this is distribution-
    identical to two independent augment_batch calls."""
    B = images.shape[0]
    both = jnp.concatenate([images, views], axis=0)
    out = augment_batch(both, rng, cfg, mean, std, train=train, out_dtype=out_dtype)
    return out[:B], out[B:]


def augment_batch_with_boxes(
    images: jnp.ndarray,
    boxes: jnp.ndarray,  # (B, N, 5) xyxy+class, -1-padded rows
    rng: jax.Array,
    cfg: AugmentConfig,
    mean: float,
    std: float,
    train: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Box-aware augmentation for detection (reference uses imgaug's box-tracking
    Sequential incl. ElasticTransformation, Datasets/dataset_utils.py:54-73): the
    images are warped with the sampled flips/affine/elastic and the box corners are
    mapped analytically through the SAME composed transform; padded (-1) rows stay
    padded.

    Elastic corner tracking: the warp reads out[d] = in[A·d + t + disp(d)], so a
    source point s lands at the d solving s = A·d + t + disp(d). To first order in
    the smooth, small field (alpha ~ 10 px over sigma ~ 15 px):
    d ~= d_aff - A^{-1}·disp(d_aff) with d_aff = A^{-1}(s - t) — the correction
    evaluates the (low-res) field at the affine-mapped corner. This matches imgaug's
    keypoint semantics (displace a point by the field at its location) while staying
    exactly consistent with OUR sampled field."""
    x = minmax_standardize(images, mean, std)
    if not train:
        return x, boxes
    B, H, W, _ = x.shape
    k_aff, k_el = jax.random.split(rng)
    mats = sample_affine_matrices(k_aff, B, H, W, cfg)
    lowres = sample_elastic_lowres(k_el, B, H, W, cfg) if cfg.elastic_p > 0 else None
    disp = (
        jax.image.resize(lowres, (B, H, W, 2), method="bilinear")
        if lowres is not None
        else None
    )
    background = (0.0 - mean) / std
    from .warp import warp_affine_elastic

    beta_max, disp_max = warp_bounds(cfg)
    warped = warp_affine_elastic(x - background, mats, disp, beta_max=beta_max,
                                 disp_max=disp_max) + background

    valid = boxes[..., 4:5] >= 0
    corners = jnp.stack(
        [
            boxes[..., [0, 1]],  # x1,y1
            boxes[..., [2, 1]],  # x2,y1
            boxes[..., [0, 3]],  # x1,y2
            boxes[..., [2, 3]],  # x2,y2
        ],
        axis=2,
    )  # (B, N, 4, 2)
    Bn, N = corners.shape[:2]
    mapped = transform_points(mats, corners.reshape(Bn, N * 4, 2))  # (B, N*4, 2)
    if lowres is not None:
        # first-order elastic correction: d -= A^{-1}·disp(d_aff)
        d_at = elastic_at_points(lowres, mapped, H, W)  # (B, N*4, 2)
        a_inv = _inverse_2x2(mats)
        mapped = mapped - jnp.einsum("bij,bnj->bni", a_inv, d_at)
    mapped = mapped.reshape(Bn, N, 4, 2)
    new_min = jnp.min(mapped, axis=2)
    new_max = jnp.max(mapped, axis=2)
    new_boxes = jnp.concatenate(
        [
            jnp.clip(new_min[..., 0:1], 0, W - 1),
            jnp.clip(new_min[..., 1:2], 0, H - 1),
            jnp.clip(new_max[..., 0:1], 0, W - 1),
            jnp.clip(new_max[..., 1:2], 0, H - 1),
            boxes[..., 4:5],
        ],
        axis=-1,
    )
    new_boxes = jnp.where(valid, new_boxes, -1.0)
    return warped, new_boxes


def _inverse_2x2(matrices_fwd_inv: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 2) inverse of the linear part of the (B, 2, 3) dst->src maps."""
    a = matrices_fwd_inv[:, :, :2]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    return jnp.stack(
        [
            jnp.stack([a[:, 1, 1] / det, -a[:, 0, 1] / det], axis=-1),
            jnp.stack([-a[:, 1, 0] / det, a[:, 0, 0] / det], axis=-1),
        ],
        axis=1,
    )


def transform_points(matrices_fwd_inv: jnp.ndarray, points_xy: jnp.ndarray) -> jnp.ndarray:
    """Map points with the FORWARD transform given the inverse matrices produced by
    sample_affine_matrices (used to keep detection boxes consistent with the image).

    matrices_fwd_inv: (B, 2, 3) inverse maps; points_xy: (B, N, 2).
    """
    t = matrices_fwd_inv[:, :, 2]
    # invert: src = A dst + t  =>  dst = A^-1 (src - t)
    inv = _inverse_2x2(matrices_fwd_inv)
    rel = points_xy - t[:, None, :]
    return jnp.einsum("bij,bnj->bni", inv, rel)
