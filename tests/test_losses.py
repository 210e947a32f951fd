"""Loss math parity tests: golden values computed with torch (CPU) using the reference's
formulas (breast_clip.py:29-127), plus GSPMD-vs-reference-DDP equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mammo_clip_tpu.losses import (
    bce_with_logits_loss,
    build_loss,
    contrastive_clip_loss,
    cross_entropy,
    multi_positive_clip_loss,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _rand_embeddings(rng, n=8, d=16):
    return _norm(rng.standard_normal((n, d)).astype(np.float32))


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=6)
    for s in (0.0, 0.1, 0.3):
        ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), s)
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels), label_smoothing=s)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)


def _reference_multi_positive(i1, t1, t2, i2, scale, i2i_w, t2t_w, smoothing=0.0):
    """Reference math re-stated with torch (breast_clip.py:45-127), single rank."""
    i1, t1, t2, i2 = map(torch.tensor, (i1, t1, t2, i2))
    labels = torch.arange(i1.shape[0])
    ce = lambda a, b, s=smoothing: F.cross_entropy(scale * a @ b.T, labels, label_smoothing=s)
    loss_i2t = (ce(i1, t1) + ce(i2, t1) + ce(i1, t2) + ce(i2, t2)) / 4.0
    loss_t2i = (ce(t1, i1) + ce(t1, i2) + ce(t2, i1) + ce(t2, i2)) / 4.0
    loss_i2i = (ce(i1, i2, 0.0) + ce(i2, i1, 0.0)) / 2.0
    loss_t2t = (ce(t2, t1, 0.0) + ce(t1, t2, 0.0)) / 2.0
    return ((loss_i2t + loss_t2i) / 2.0 + i2i_w * loss_i2i + t2t_w * loss_t2t).item()


def test_multi_positive_matches_reference_math():
    rng = np.random.default_rng(1)
    i1, t1, t2, i2 = (_rand_embeddings(rng) for _ in range(4))
    scale = float(np.exp(np.log(1 / 0.07)))
    out = multi_positive_clip_loss(
        image_embeddings=jnp.asarray(i1),
        text_embeddings=jnp.asarray(t1),
        text_embeddings2=jnp.asarray(t2),
        image_view_embeddings=jnp.asarray(i2),
        logit_scale=jnp.asarray(scale),
        i2i_weight=1.0,
        t2t_weight=0.5,
    )
    ref = _reference_multi_positive(i1, t1, t2, i2, scale, 1.0, 0.5)
    np.testing.assert_allclose(float(out["contrastive"]), ref, rtol=1e-5)


def test_contrastive_weights():
    rng = np.random.default_rng(2)
    i1, t1 = _rand_embeddings(rng), _rand_embeddings(rng)
    scale = 14.0
    out = contrastive_clip_loss(
        image_embeddings=jnp.asarray(i1),
        text_embeddings=jnp.asarray(t1),
        logit_scale=jnp.asarray(scale),
    )
    # reference: 0.75 * i2t + 0.25 * t2i (breast_clip_contrastive.py:58)
    labels = torch.arange(8)
    ref = (
        0.75 * F.cross_entropy(scale * torch.tensor(i1 @ t1.T), labels)
        + 0.25 * F.cross_entropy(scale * torch.tensor(t1 @ i1.T), labels)
    ).item()
    np.testing.assert_allclose(float(out["contrastive"]), ref, rtol=1e-5)


def test_bce_clamps_negative_labels():
    logits = jnp.asarray([[0.5], [-1.0]])
    targets = jnp.asarray([[-1.0], [1.0]])  # -1 = missing -> clamped to 0
    ours = bce_with_logits_loss(logits, targets)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor([[0.5], [-1.0]]), torch.tensor([[0.0], [1.0]])
    )
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-6)


def test_global_batch_equals_per_rank_mean():
    """GSPMD global-batch CE == mean over DDP ranks of per-rank CE with rank-offset
    labels (the reference's distributed objective, breast_clip.py:34-78)."""
    rng = np.random.default_rng(3)
    world, per = 4, 4
    n = world * per
    img, txt = _rand_embeddings(rng, n), _rand_embeddings(rng, n)
    scale = 10.0

    # ours: one global CE
    ours = contrastive_clip_loss(
        image_embeddings=jnp.asarray(img),
        text_embeddings=jnp.asarray(txt),
        logit_scale=jnp.asarray(scale),
        i2t_weight=0.5,
        t2i_weight=0.5,
    )["contrastive"]

    # reference: per-rank local embeddings vs all-gathered, labels offset by rank*per
    losses = []
    for r in range(world):
        sl = slice(r * per, (r + 1) * per)
        labels = torch.arange(per) + r * per
        li = F.cross_entropy(scale * torch.tensor(img[sl] @ txt.T), labels)
        lt = F.cross_entropy(scale * torch.tensor(txt[sl] @ img.T), labels)
        losses.append(0.5 * (li + lt))
    ref = torch.stack(losses).mean().item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_build_loss_combined():
    rng = np.random.default_rng(4)
    i1, t1, t2, i2 = (_rand_embeddings(rng) for _ in range(4))
    cfg = {
        "breast_clip": {
            "label_smoothing": 0.0,
            "i2i_weight": 1.0,
            "t2t_weight": 0.5,
            "loss_ratio": 1.0,
        },
        "classification": {"loss_ratio": 0.0},  # skipped (reference loss/__init__.py:14)
    }
    loss_fn = build_loss(cfg)
    outputs = {
        "image_embeddings": jnp.asarray(i1),
        "text_embeddings": jnp.asarray(t1),
        "text_embeddings2": jnp.asarray(t2),
        "image_view_embeddings": jnp.asarray(i2),
        "logit_scale": jnp.asarray(14.2857),
    }
    d = loss_fn(outputs, {}, is_train=True)
    assert set(d) >= {"contrastive", "total", "contrastive/i2t", "contrastive/t2i"}
    np.testing.assert_allclose(float(d["total"]), float(d["contrastive"]), rtol=1e-6)
    assert "classification" not in d
