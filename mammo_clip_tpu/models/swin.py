"""Swin Transformer image encoder (Flax, NHWC).

Completes the reference's HuggingfaceImageEncoder 'swin' option
(reference: breastclip/model/modules/image_encoder.py:17-48 and factory
modules/__init__.py:11-33). Swin-v1 topology: 4x4 patch embed, 4 stages of
window attention with alternating shifted windows (roll + attention mask),
patch-merging downsamples between stages. The CLIP module consumes mean-pooled
final-stage features as the global representation.

TPU-first: window partition is a reshape/transpose (no gather); the shifted-window
attention mask is computed at trace time for the static input shape; attention over
(nW*B, win*win, C) batches lands on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5  # HF SwinConfig.layer_norm_eps (weight-import parity)

    @classmethod
    def tiny_test(cls) -> "SwinConfig":
        return cls(patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 2), window=4)

    @property
    def out_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(windows: jnp.ndarray, w: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = windows.shape[-1]
    x = windows.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _rel_pos_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative-position bias table
    (Swin v1, Liu 2021) — computed once per static window size."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, w*w)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """(num_windows, w*w, w*w) additive mask for shifted-window attention."""
    img = np.zeros((1, H, W, 1), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    wins = img.reshape(1, H // w, w, W // w, w, 1).transpose(0, 1, 3, 2, 4, 5)
    wins = wins.reshape(-1, w * w)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    heads: int
    shift: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        B, H, W, C = x.shape
        w = cfg.window
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="ln1")(x)
        if self.shift:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
        wins = _window_partition(h, w)  # (B*nW, w*w, C)

        head_dim = C // self.heads
        qkv = nn.DenseGeneral((3, self.heads, head_dim), dtype=self.dtype, name="qkv")(wins)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqnd,bknd->bnqk", q * head_dim**-0.5, k).astype(jnp.float32)
        # learned relative-position bias (Swin v1; HF SwinSelfAttention
        # relative_position_bias_table) — static index, tiny (w^2)^2 lookup
        table = self.param("rel_pos_table", nn.initializers.truncated_normal(0.02),
                           ((2 * w - 1) ** 2, self.heads))
        idx = jnp.asarray(_rel_pos_index(w).reshape(-1))
        bias = table.astype(jnp.float32)[idx].reshape(w * w, w * w, self.heads)
        logits = logits + bias.transpose(2, 0, 1)[None]
        if self.shift:
            mask = jnp.asarray(_shift_mask(H, W, w, self.shift))  # (nW, ww, ww)
            n_w = mask.shape[0]
            logits = logits.reshape(B, n_w, self.heads, w * w, w * w)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(B * n_w, self.heads, w * w, w * w)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", attn, v)
        out = nn.DenseGeneral(C, axis=(-2, -1), dtype=self.dtype, name="proj")(ctx)
        out = _window_reverse(out, w, B, H, W)
        if self.shift:
            out = jnp.roll(out, (self.shift, self.shift), axis=(1, 2))
        x = x + out

        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(int(C * cfg.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        return x + h


class SwinTransformer(nn.Module):
    cfg: SwinConfig = SwinConfig()
    in_channels: int = 1
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.cfg.out_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        p, w = cfg.patch_size, cfg.window
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="patch_ln")(x)
        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            if stage > 0:
                # patch merging: 2x2 space-to-depth + linear reduction
                Bh, Hh, Wh, Ch = x.shape
                x = x.reshape(Bh, Hh // 2, 2, Wh // 2, 2, Ch).transpose(0, 1, 3, 2, 4, 5)
                x = x.reshape(Bh, Hh // 2, Wh // 2, 4 * Ch)
                x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name=f"merge_ln{stage}")(x)
                x = nn.Dense(2 * Ch, use_bias=False, dtype=self.dtype, name=f"merge{stage}")(x)
            assert x.shape[1] % w == 0 and x.shape[2] % w == 0, (
                f"stage {stage} feature map {x.shape[1]}x{x.shape[2]} not divisible by "
                f"window {w}; pick input sizes divisible by patch*window*2^stages"
            )
            for i in range(depth):
                # no shift when the grid is a single window (Swin v1 / HF
                # SwinLayer set_shift_and_window_resolution semantics)
                shift = (0 if i % 2 == 0 or min(x.shape[1], x.shape[2]) <= w
                         else w // 2)
                x = SwinBlock(cfg, heads=heads, shift=shift, dtype=self.dtype,
                              name=f"stage{stage}_block{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="final_ln")(x)
        return {"pooled": jnp.mean(x, axis=(1, 2)), "features": x}
