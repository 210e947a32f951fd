"""On-device augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mammo_clip_tpu.ops.augment import (
    AugmentConfig,
    affine_grid,
    augment_batch,
    minmax_standardize,
    sample_affine_matrices,
    sample_elastic_displacement,
    transform_points,
    warp_bilinear,
)


def test_minmax_standardize_matches_reference_formula():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(2, 8, 8, 1)).astype(np.uint8)
    mean, std = 0.3089279, 0.25053555408335154
    out = np.asarray(minmax_standardize(jnp.asarray(img), mean, std))
    x = img.astype(np.float32)
    ref = (
        (x - x.min(axis=(1, 2, 3), keepdims=True))
        / (x.max(axis=(1, 2, 3), keepdims=True) - x.min(axis=(1, 2, 3), keepdims=True))
        - mean
    ) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_identity_warp_is_noop():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 16, 12, 1)).astype(np.float32))
    eye = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])[None], (2, 1, 1))
    coords = affine_grid(eye, 16, 12)
    out = warp_bilinear(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_pure_hflip_matrix():
    cfg = AugmentConfig(hflip_p=1.0, vflip_p=0.0, affine_p=0.0, elastic_p=0.0)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 8, 6, 1)).astype(np.float32))
    mats = sample_affine_matrices(jax.random.PRNGKey(0), 1, 8, 6, cfg)
    out = warp_bilinear(img, affine_grid(mats, 8, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[:, :, ::-1]), atol=1e-5)


def test_pure_vflip_matrix():
    cfg = AugmentConfig(hflip_p=0.0, vflip_p=1.0, affine_p=0.0, elastic_p=0.0)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, 8, 6, 1)).astype(np.float32))
    mats = sample_affine_matrices(jax.random.PRNGKey(0), 1, 8, 6, cfg)
    out = warp_bilinear(img, affine_grid(mats, 8, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[:, ::-1]), atol=1e-5)


def test_no_op_when_all_probs_zero():
    cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, affine_p=0.0, elastic_p=0.0)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 255, (2, 32, 24, 1)).astype(np.float32))
    out = augment_batch(img, jax.random.PRNGKey(1), cfg, mean=0.3, std=0.25)
    expected = minmax_standardize(img, 0.3, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_elastic_displacement_stats():
    cfg = AugmentConfig(elastic_p=1.0, elastic_alpha=10.0, elastic_sigma=15.0)
    disp = sample_elastic_displacement(jax.random.PRNGKey(0), 2, 64, 48, cfg)
    assert disp.shape == (2, 64, 48, 2)
    d = np.asarray(disp)
    assert np.all(np.abs(d) <= cfg.elastic_alpha + 1e-5)
    assert np.abs(d).max() > 0.01  # non-degenerate
    # smoothness: neighbor deltas are small relative to range
    grad = np.abs(np.diff(d, axis=1)).max()
    assert grad < 1.5


def test_elastic_gate_off():
    cfg = AugmentConfig(elastic_p=0.0)
    disp = sample_elastic_displacement(jax.random.PRNGKey(0), 1, 32, 32, cfg)
    np.testing.assert_array_equal(np.asarray(disp), 0.0)


def test_transform_points_roundtrip():
    """transform_points applies the forward map: warping the image with the inverse map
    and forward-mapping a source point must land where the feature moved."""
    cfg = AugmentConfig(hflip_p=1.0, vflip_p=0.0, affine_p=0.0, elastic_p=0.0)
    mats = sample_affine_matrices(jax.random.PRNGKey(0), 1, 10, 10, cfg)
    pts = jnp.asarray([[[2.0, 3.0]]])  # x=2, y=3 in source image
    mapped = np.asarray(transform_points(mats, pts))[0, 0]
    # hflip on width 10: x -> 9 - x
    np.testing.assert_allclose(mapped, [7.0, 3.0], atol=1e-4)


def test_augment_batch_shapes_and_finite():
    cfg = AugmentConfig()
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 255, (4, 64, 48, 1)).astype(np.uint8))
    out = jax.jit(
        lambda im, k: augment_batch(im, k, cfg, 0.3089279, 0.2505355, train=True)
    )(img, jax.random.PRNGKey(3))
    assert out.shape == (4, 64, 48, 1)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_augment_batch_with_boxes_hflip():
    from mammo_clip_tpu.ops.augment import augment_batch_with_boxes

    cfg = AugmentConfig(hflip_p=1.0, vflip_p=0.0, affine_p=0.0, elastic_p=0.0)
    rng = np.random.default_rng(7)
    W = 40
    img = jnp.asarray(rng.integers(0, 255, (1, 32, W, 1)).astype(np.uint8))
    boxes = jnp.asarray([[[5.0, 6.0, 15.0, 20.0, 2.0], [-1, -1, -1, -1, -1]]], jnp.float32)
    out_img, out_boxes = augment_batch_with_boxes(img, boxes, jax.random.PRNGKey(0), cfg, 0.3, 0.25)
    b = np.asarray(out_boxes)[0, 0]
    # hflip: x -> (W-1) - x, so [5,15] -> [24,34]; y unchanged; class preserved
    np.testing.assert_allclose(b, [W - 1 - 15, 6.0, W - 1 - 5, 20.0, 2.0], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_boxes)[0, 1], -1.0)  # padding stays


def test_augment_batch_with_boxes_rotation_grows_box():
    from mammo_clip_tpu.ops.augment import augment_batch_with_boxes

    cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, affine_p=1.0, rotate_deg=15.0,
                        translate_frac=0.0, scale_min=1.0, scale_max=1.0,
                        shear_deg=0.0, elastic_p=0.0)
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 1)).astype(np.uint8))
    boxes = jnp.asarray([[[20.0, 20.0, 40.0, 40.0, 0.0]]], jnp.float32)
    out_img, out_boxes = augment_batch_with_boxes(img, boxes, jax.random.PRNGKey(1), cfg, 0.3, 0.25)
    b = np.asarray(out_boxes)[0, 0]
    assert b[4] == 0.0
    # rotated axis-aligned hull of a square is at least as large
    assert (b[2] - b[0]) >= 19.0 and (b[3] - b[1]) >= 19.0
    assert np.all(b[:4] >= 0) and np.all(b[:4] <= 63)


def test_augment_two_views_matches_concat():
    """augment_two_views == one augment_batch over the concatenated batch, split."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mammo_clip_tpu.ops.augment import AugmentConfig, augment_batch, augment_two_views

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 255, (3, 32, 24, 1), dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 255, (3, 32, 24, 1), dtype=np.uint8))
    cfg = AugmentConfig()
    key = jax.random.PRNGKey(7)
    o1, o2 = augment_two_views(a, b, key, cfg, 0.3, 0.25, train=True)
    both = augment_batch(jnp.concatenate([a, b], axis=0), key, cfg, 0.3, 0.25, train=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(both[:3]))
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(both[3:]))
    assert o1.shape == a.shape and o2.shape == b.shape


def test_elastic_at_points_matches_resize():
    """elastic_at_points == the bilinearly-upsampled field the warp uses."""
    from mammo_clip_tpu.ops.augment import elastic_at_points, sample_elastic_lowres

    cfg = AugmentConfig(elastic_p=1.0, elastic_alpha=10.0, elastic_sigma=15.0)
    H, W = 64, 48
    lowres = sample_elastic_lowres(jax.random.PRNGKey(0), 2, H, W, cfg)
    full = jax.image.resize(lowres, (2, H, W, 2), method="bilinear")
    rng = np.random.default_rng(0)
    ys = rng.integers(0, H, 40)
    xs = rng.integers(0, W, 40)
    pts = jnp.asarray(np.stack([xs, ys], -1)[None].repeat(2, 0), jnp.float32)
    at = np.asarray(elastic_at_points(lowres, pts, H, W))
    expect = np.asarray(full)[np.arange(2)[:, None], ys[None], xs[None]]
    np.testing.assert_allclose(at, expect, rtol=1e-5, atol=1e-5)


def test_elastic_corner_tracking_self_consistent():
    """A tracked corner d satisfies the warp's source equation s = A d + t + disp(d)
    to first order (the approximation error is O(|disp|·|grad disp|) << 1 px)."""
    from mammo_clip_tpu.ops.augment import (
        _inverse_2x2,
        elastic_at_points,
        sample_affine_matrices,
        sample_elastic_lowres,
        transform_points,
    )

    cfg = AugmentConfig(hflip_p=0.5, vflip_p=0.5, affine_p=1.0, rotate_deg=15.0,
                        translate_frac=0.05, scale_min=0.9, scale_max=1.1,
                        shear_deg=10.0, elastic_p=1.0, elastic_alpha=10.0,
                        elastic_sigma=15.0)
    H, W = 160, 120
    B = 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    mats = sample_affine_matrices(k1, B, H, W, cfg)
    lowres = sample_elastic_lowres(k2, B, H, W, cfg)

    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.uniform(20, 100, (B, 16, 2)), jnp.float32)  # interior points
    d_aff = transform_points(mats, s)
    d = d_aff - jnp.einsum("bij,bnj->bni", _inverse_2x2(mats), elastic_at_points(lowres, d_aff, H, W))

    # source the warp would read at d:
    a = mats[:, :, :2]
    t = mats[:, :, 2]
    src = jnp.einsum("bij,bnj->bni", a, d) + t[:, None, :] + elastic_at_points(lowres, d, H, W)
    err = np.abs(np.asarray(src - s))
    assert err.max() < 0.75, err.max()  # sub-pixel: first-order correction holds


def test_augment_batch_with_boxes_elastic_tracks_blob():
    """End to end: with elastic ON, the tracked box still covers the warped blob."""
    from mammo_clip_tpu.ops.augment import augment_batch_with_boxes

    cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, affine_p=1.0, rotate_deg=10.0,
                        translate_frac=0.03, scale_min=0.95, scale_max=1.05,
                        shear_deg=5.0, elastic_p=1.0, elastic_alpha=10.0,
                        elastic_sigma=15.0)
    H, W = 128, 96
    img = np.zeros((1, H, W, 1), np.uint8)
    img[0, 50:70, 30:50, 0] = 255
    boxes = jnp.asarray([[[30.0, 50.0, 49.0, 69.0, 1.0]]], jnp.float32)
    out_img, out_boxes = augment_batch_with_boxes(
        jnp.asarray(img), boxes, jax.random.PRNGKey(5), cfg, 0.3, 0.25)
    b = np.asarray(out_boxes)[0, 0]
    assert b[4] == 1.0
    # locate the warped blob (bright pixels) and check containment within ~2.5 px
    o = np.asarray(out_img)[0, :, :, 0]
    bright = o > o.mean() + 2.5 * o.std()
    ys, xs = np.where(bright)
    assert len(ys) > 100  # blob survived
    pad = 2.5
    assert b[0] <= xs.min() + pad and b[2] >= xs.max() - pad
    assert b[1] <= ys.min() + pad and b[3] >= ys.max() - pad

def test_shear_is_x_axis_like_albumentations():
    """Affine shear must displace x as a function of y (skimage/albumentations
    AffineTransform parametrization: shear is an angle in the y basis column).
    Regression: an earlier revision applied [[1,0],[sh,1]] — a y-axis shear."""
    cfg = AugmentConfig(hflip_p=0.0, vflip_p=0.0, affine_p=1.0,
                        rotate_deg=0.0, shear_deg=20.0,
                        scale_min=1.0, scale_max=1.0, translate_frac=0.0,
                        elastic_p=0.0)
    mats = sample_affine_matrices(jax.random.PRNGKey(3), 16, 64, 64, cfg)
    mats = np.asarray(mats)
    # mats hold the INVERSE map (dst->src); invert back to the forward F
    for m in mats:
        F = np.linalg.inv(m[:, :2])
        # with rotation=0: F = [[sx, -sy*sin(sh)], [0, sy*cos(sh)]]
        assert abs(F[1, 0]) < 1e-5, F          # no y-shear component
        sh = np.arctan2(-F[0, 1], F[1, 1])
        assert abs(sh) <= np.deg2rad(20.0) + 1e-6
    # at least one draw actually sheared
    Fs = [np.linalg.inv(m[:, :2]) for m in mats]
    assert max(abs(F[0, 1]) for F in Fs) > 1e-3
