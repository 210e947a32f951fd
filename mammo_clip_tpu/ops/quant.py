"""int8 quantized matmul for the MXU (v5e+ has native s8xs8->s32 systolic
support at 2x the bf16 rate).

Targets the deep-stage 1x1 convolutions of the flagship recipe (VERDICT r2 #5 /
ROADMAP #9): expand/project convs with 128-multiple channel counts are plain
matmuls over (N*H*W, C), which is exactly the shape the int8 MXU wants. The
reference's analogue is AMP fp16 (trainer.py:138,271-278) — this goes one tier
further on hardware that has an int8 path.

Scheme (standard dynamic symmetric PTQ-style quantized training):
* activations: per-TENSOR dynamic scale max|x|/127 (cheap: one reduction,
  no per-row rescale pass);
* weights: per-OUTPUT-CHANNEL scales (columns of the (K, N) kernel);
* accumulation in int32 on the MXU, dequantize into fp32, cast back;
* gradients: straight-through — the backward pass uses the UNQUANTIZED
  operands in bf16 (quantization noise is treated as identity at bwd), the
  standard recipe for int8 forward training.

Numerics bound: with ~normal activations the per-tensor int8 error is
~0.3-0.6% relative — the learning-impact gate is
tests/test_quant.py::test_int8_deep_stages_learning_parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _quantize_per_tensor(x: jnp.ndarray):
    """x -> (int8 values, fp32 scale). Symmetric, dynamic."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_per_column(w: jnp.ndarray):
    """(K, N) -> (int8, (N,) fp32 scales)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_dot(x: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16):
    """Quantized ``x @ w``: int8 MXU forward, straight-through bf16 backward.

    x: (..., K); w: (K, N). Returns (..., N) in ``out_dtype``.
    """
    return _int8_dot_fwd_impl(x, w, out_dtype)


def _int8_dot_fwd_impl(x, w, out_dtype):
    qx, sx = _quantize_per_tensor(x)
    qw, sw = _quantize_per_column(w)
    acc = jax.lax.dot_general(
        qx, qw,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def _int8_dot_fwd(x, w, out_dtype):
    return _int8_dot_fwd_impl(x, w, out_dtype), (x, w)


def _int8_dot_bwd(out_dtype, res, g):
    x, w = res
    gb = g.astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        gb, w.astype(jnp.bfloat16),
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dw = x^T g over all leading dims
    lead = tuple(range(g.ndim - 1))
    dw = jax.lax.dot_general(
        x.astype(jnp.bfloat16), gb,
        dimension_numbers=((lead, lead), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)


def int8_conv1x1(x: jnp.ndarray, kernel: jnp.ndarray,
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """1x1 conv as an int8 matmul. x: (N, H, W, Cin); kernel: (1, 1, Cin, Cout)."""
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = int8_dot(x.reshape(n * h * w, cin), kernel.reshape(cin, cout), out_dtype)
    return y.reshape(n, h, w, cout)
