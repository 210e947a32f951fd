"""Probe: Pallas TPU flash attention vs the shipped einsum attention (BERT shapes).

Context (BASELINE.md r4 roofline ledger): the text tower runs at ~1.99x its MXU
floor inside the train step (22.3 ms vs 11.2 ms for 16 texts @ 256 tokens), and
~20 ms when profiled alone. The per-op profile attributes ~4-6 ms/iter to
convert/multiply_reduce fusions around the softmax — the (B,N,S,S) score
tensors crossing HBM between the QK^T dot, the masked fp32 softmax, and the
PV dot (fwd + the mirrored bwd chain). A flash-attention kernel keeps the
scores in VMEM end-to-end. This probe measures whether the stock
``jax.experimental.pallas.ops.tpu.flash_attention`` kernel (fwd+bwd through a
scalar loss) beats the shipped einsum formulation (models/bert.py
BertSelfAttention, amp_attn_scores=True — the promoted r4 recipe) at the
production shape (16, 12, 256, 64) bf16.

Reference being probed: the reference's text tower is HF BertModel under torch
AMP (``/root/reference/src/codebase/breastclip/model/modules/text_encoder.py``);
its SDPA path is the CUDA analogue of this kernel.

Run (real TPU):  python benchmarks/probe_flash_attention.py [--iters 50]
Result ledger:   BASELINE.md r4 "flash attention" probe section.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, S, D = 16, 12, 256, 64  # production text-tower attention shape


def einsum_attention(q, k, v, mask):
    """The shipped formulation: models/bert.py:131-147 (amp_attn_scores)."""
    scale = D**-0.5
    logits = jnp.einsum("bqnd,bknd->bnqk", q * scale, k)
    neg = jnp.asarray(jnp.finfo(jnp.bfloat16).min, jnp.bfloat16)
    logits = jnp.where(mask[:, None, None, :], logits.astype(jnp.bfloat16), neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


def flash_attention_bnsd(q, k, v, block_q: int, block_k: int, block_b: int = 1):
    """Stock Pallas TPU kernel; operands (B,N,S,D); scale folded into q."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    bs = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=block_b,
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_k,
        block_k_dkv=block_k,
        block_q_dkv=block_q,
        block_k_major_dq=block_k,
        block_k_dq=block_k,
        block_q_dq=block_q,
    )
    return flash_attention(q, k, v, sm_scale=D**-0.5, block_sizes=bs)


def build(variant: str, block_q: int, block_k: int, block_b: int = 1, inner: int = 1):
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((B, S, N, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((B, S, N, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(r.standard_normal((B, S, N, D)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((B, S, N, D)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((B, S), bool)

    if variant == "einsum":

        def loss(q, k, v):
            return jnp.sum((einsum_attention(q, k, v, mask) * w).astype(jnp.float32))

    else:

        def loss(q, k, v):
            # kernel layout is (B, N, S, D)
            ctx = flash_attention_bnsd(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                block_q,
                block_k,
                block_b,
            ).transpose(0, 2, 1, 3)
            return jnp.sum((ctx * w).astype(jnp.float32))

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    if inner <= 1:
        g = jax.jit(vg)
        return functools.partial(g, q, k, v)

    # Relay dispatch costs ~10+ ms per jit call on this runtime (BASELINE.md
    # r4 fused-multistep probe) — at these 1-2 ms kernel times it dominates.
    # Fold `inner` fwd+bwd evaluations into ONE call via lax.scan; the i-th
    # iteration perturbs q by i*1e-3 so CSE can't collapse the loop.
    def scanned(q, k, v):
        def body(acc, i):
            l, grads = vg(q + i.astype(q.dtype) * 1e-3, k, v)
            return acc + l, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(inner))
        return acc

    g = jax.jit(scanned)
    return functools.partial(g, q, k, v)


def fwd_value(variant: str, block_q: int, block_k: int, block_b: int = 1):
    fn = build(variant, block_q, block_k, block_b)
    l, grads = fn()
    return float(l), [float(jnp.linalg.norm(t.astype(jnp.float32))) for t in grads]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--block-k", type=int, default=256)
    ap.add_argument("--block-b", type=int, default=1)
    ap.add_argument("--inner", type=int, default=1,
                    help="fwd+bwd evaluations fused per jit call (lax.scan); "
                         ">1 amortizes the ~10 ms relay dispatch out of the number")
    args = ap.parse_args()

    # numerics first: same inputs, loss + grad-norm agreement at bf16 resolution
    le, ge = fwd_value("einsum", args.block_q, args.block_k)
    lf, gf = fwd_value("flash", args.block_q, args.block_k, args.block_b)
    print(f"einsum  loss {le:+.4f}  grad norms {['%.3f' % g for g in ge]}")
    print(f"flash   loss {lf:+.4f}  grad norms {['%.3f' % g for g in gf]}")
    rel = abs(le - lf) / max(abs(le), 1e-6)
    print(f"loss rel diff {rel:.2e} (bf16 tolerance ~1e-2)")

    for variant in ("einsum", "flash"):
        fn = build(variant, args.block_q, args.block_k, args.block_b, args.inner)
        out = fn()  # compile
        l = out if args.inner > 1 else out[0]
        acc = l * 0.0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
            acc = acc + (out if args.inner > 1 else out[0])
        float(acc)  # chain-sync: fetching the sum forces every dispatch
        wall = (time.perf_counter() - t0) * 1e3
        per = wall / (args.iters * args.inner)
        print(f"{variant:7s} {per:7.3f} ms/eval  ({args.iters} calls x {args.inner} inner)")


if __name__ == "__main__":
    main()
