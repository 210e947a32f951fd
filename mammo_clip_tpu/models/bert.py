"""BERT text encoder in Flax (BioClinicalBERT-compatible architecture).

Capability parity with the reference's HF text encoder
(reference: breastclip/model/modules/text_encoder.py:5-49, model
``emilyalsentzer/Bio_ClinicalBERT`` per configs/model/clip_b5_det_clinical.yaml:12-13),
returning the full ``last_hidden_state``; pooling (eos/bos/mean) happens in the CLIP
module, as in the reference (clip.py:62-78).

TPU-first choices:
* all matmuls shaped (B*S, H) x (H, ...) land on the MXU; attention uses
  ``jax.nn.dot_product_attention``-style einsum formulation with static 256-token
  sequences (reference: text_max_length=256, pre_train_b5_clip.yaml:27);
* FFN + attention output kernels carry 'model'-axis partitioning metadata for optional
  tensor parallelism (see parallel/partitioning.py);
* optional ``jax.checkpoint`` rematerialization replaces HF gradient checkpointing
  (text_encoder.py:42-43).

Weights of the public HF torch checkpoint can be imported with
convert/torch_import.py (same parameter tree layout as HF BERT).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.constraint import shard_seq as _seq_shard


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 28996  # Bio_ClinicalBERT (BERT-base-cased vocab)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1
    remat: bool = False
    fused_qkv: bool = False  # compute Q/K/V as ONE (H, 3H) MXU matmul by
    #   concatenating the three projection kernels at run time. The param tree
    #   is unchanged (query/key/value DenseGeneral leaves), so HF checkpoint
    #   import (convert/torch_import.py) and existing checkpoints are
    #   unaffected; the concat costs ~7 MB of fp32 reads per layer — noise
    #   next to the matmul. Opt-in perf experiment for the BERT MFU item
    #   (BASELINE.md r3 profile: 22 ms, ~48% MFU).
    seq_parallel: bool = False  # Megatron-style SEQUENCE parallelism: shard the
    #   (B, S, H) activations of the LN/dropout/residual regions along S over
    #   the TP 'model' axis (parallel/constraint.shard_seq). Pure GSPMD
    #   constraint — XLA rewrites the TP all-reduces into reduce-scatter +
    #   all-gather pairs around the sharded regions. Opt-in, inert without an
    #   active mesh context (``with jax.set_mesh(mesh):``); beyond-reference
    #   capability (the reference is DDP-only, trainer_ddp.py:134).
    amp_attn_scores: bool = False  # materialize attention logits/probs in the
    #   activation dtype (bf16) instead of fp32, with the softmax REDUCTION
    #   still computed in fp32 inside the fused kernel. This is torch-AMP
    #   semantics — the reference trains under autocast (trainer_ddp.py scaler
    #   usage), where matmul outputs are stored half-precision and softmax
    #   upcasts internally — so it is the CLOSER match to the reference, not a
    #   deviation. At production shapes the fp32 (B,N,S,S) logits+probs are
    #   ~50 MB/layer/dir of HBM traffic; bf16 halves the dominant non-matmul
    #   bytes of the BERT bucket (ledger r4: BERT at 1.99x its MXU floor).
    #   Opt-in pending the TPU probe (benchmarks/profile_op.py --workload bert).

    @classmethod
    def tiny(cls) -> "BertConfig":
        """Small config for tests."""
        return cls(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, max_position_embeddings=64)


class _ProjParams(nn.Module):
    """Holds DenseGeneral-shaped Q/K/V projection params WITHOUT computing the
    matmul — the fused-QKV path concatenates them into one (H, 3H) kernel.
    Param names/shapes/init match nn.DenseGeneral exactly, so the tree is
    indistinguishable from the unfused path (checkpoints interchange freely)."""

    in_dim: int
    features: tuple  # (num_heads, head_dim)

    @nn.compact
    def __call__(self):
        # nn.DenseGeneral draws lecun_normal over the FLATTENED (in, out) shape
        # (fan_in = in_dim), then reshapes to (in, heads, head_dim). Passing the
        # 3-D shape straight to lecun_normal would make fan_in = heads*in_dim
        # (~3.5x too small a std for BERT-base) — init here must match so a
        # from-scratch fused_qkv run starts from the same distribution.
        def _init(rng, shape, dtype):
            flat = nn.initializers.lecun_normal()(
                rng, (shape[0], int(np.prod(shape[1:]))), dtype)
            return flat.reshape(shape)

        kernel = self.param(
            "kernel",
            _init,
            (self.in_dim, *self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), self.features, jnp.float32)
        return kernel, bias


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        if cfg.fused_qkv:
            H = cfg.hidden_size
            pp = [
                _ProjParams(H, (cfg.num_heads, head_dim), name=n)()
                for n in ("query", "key", "value")
            ]
            wqkv = jnp.concatenate(
                [k.reshape(H, -1) for k, _ in pp], axis=-1
            ).astype(self.dtype)
            bqkv = jnp.concatenate([b.reshape(-1) for _, b in pp]).astype(self.dtype)
            qkv = x @ wqkv + bqkv  # (B, S, 3H) — one MXU launch
            q, k, v = (
                t.reshape(*x.shape[:-1], cfg.num_heads, head_dim)
                for t in jnp.split(qkv, 3, axis=-1)
            )
        else:
            dense = lambda name: nn.DenseGeneral(
                (cfg.num_heads, head_dim), dtype=self.dtype, name=name
            )
            q = dense("query")(x)
            k = dense("key")(x)
            v = dense("value")(x)
        # (B, S, N, D) -> attention over S with additive mask.
        scale = head_dim**-0.5
        logits = jnp.einsum("bqnd,bknd->bnqk", q * scale, k)
        if cfg.amp_attn_scores and self.dtype != jnp.float32:
            # torch-AMP semantics: scores stored in the activation dtype, the
            # softmax math upcast to fp32 inside the fused kernel (the convert
            # fuses into the reduce chain, so the (B,N,S,S) tensors cross HBM
            # once at 2 bytes instead of 4).
            neg = jnp.asarray(jnp.finfo(self.dtype).min, self.dtype)
            logits = jnp.where(mask[:, None, None, :], logits.astype(self.dtype), neg)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        else:
            neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(mask[:, None, None, :], logits.astype(jnp.float32), neg)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v)
        out = nn.DenseGeneral(
            cfg.hidden_size, axis=(-2, -1), dtype=self.dtype, name="output"
        )(ctx)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        sp = _seq_shard if cfg.seq_parallel else (lambda t: t)
        attn = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(x, mask, deterministic)
        attn = nn.Dropout(cfg.dropout_rate)(attn, deterministic=deterministic)
        # seq_parallel: the LN/dropout/residual regions between the TP matmuls
        # are sequence-sharded over 'model' (constraint only; GSPMD inserts the
        # reduce-scatter/all-gather pairs) — see parallel/constraint.shard_seq.
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="attention_ln")(sp(x + attn))
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="ffn_output")(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="ffn_ln")(sp(x + h))
        return x


class BertEncoder(nn.Module):
    """Returns last_hidden_state (B, S, H)."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.cfg.hidden_size

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, S = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(S)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype, name="position_embeddings")(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln")(x)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
        if cfg.seq_parallel:
            x = _seq_shard(x)

        mask = attention_mask.astype(bool)
        layer_cls = BertLayer
        if cfg.remat:
            layer_cls = nn.remat(BertLayer, static_argnums=(3,))
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, name=f"layer_{i}")(x, mask, deterministic)
        return x


def pool_text(
    hidden: jnp.ndarray, attention_mask: jnp.ndarray, pooling: str
) -> jnp.ndarray:
    """Sequence pooling, matching the reference's encode_text (clip.py:62-78).

    eos:  feature at index sum(mask)-1 (last real token).
    bos:  feature at index 0.
    mean: mask-weighted mean.
    """
    if pooling == "eos":
        idx = jnp.sum(attention_mask, axis=-1).astype(jnp.int32) - 1
        return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    if pooling == "bos":
        return hidden[:, 0]
    if pooling == "mean":
        m = attention_mask[..., None].astype(hidden.dtype)
        return jnp.sum(hidden * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1e-9, None)
    raise NotImplementedError(f"unsupported pooling: {pooling}")
