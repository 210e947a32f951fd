"""EfficientNet-B0..B7 in Flax, TPU-first (NHWC, bf16, XLA SAME padding).

Capability parity with the reference's pretraining backbone — a lukemelas-style
EfficientNet with TF "SAME" asymmetric padding, SE blocks, swish, and stochastic depth
(reference: breastclip/model/modules/efficientnet_custom.py:36-411 and
efficient_net_custom_utils.py BlockDecoder specs) — but written from the published
EfficientNet architecture (Tan & Le 2019), not translated:

* NHWC layout (TPU conv layout; the reference is NCHW).
* ``padding='SAME'`` on ``nn.Conv`` reproduces TF's asymmetric same-padding exactly, so
  the reference's Conv2dStaticSamePadding machinery (efficient_net_custom_utils.py:248-277)
  collapses to a flag.
* swish = ``jax.nn.silu``; the reference's MemoryEfficientSwish custom autograd Fn
  (efficient_net_custom_utils.py:64-76) is unnecessary — XLA rematerializes the fusion.
* Per-sample stochastic depth with rates linearly scaled by block index, matching the
  reference's ``drop_connect_rate * idx / len(blocks)`` schedule
  (efficientnet_custom.py forward).

Feature contract (used by CLIP / classifier / detector / Mammo-FActOR):
``__call__`` returns a dict with
  ``pooled``     (N, C_head)  global-average-pooled head features — what the reference's
                 dict-input forward returns as the pooled vector (efficientnet_custom.py:298-305)
  ``features``   (N, H/32, W/32, C_head) raw head feature map (pre-pool) — the reference's
                 ``raw_feature_map``, consumed by Mammo-FActOR
  ``endpoints``  dict of reduction_1..5 feature maps (efficientnet_custom.py:226-260)
  ``taps``       tuple of per-block outputs at ``feature_taps`` indices — the detector's
                 C3/C4 taps (reference: Detectors/retinanet/efficient_net.py:207-244 with
                 source_layer_indexes b5=[26,37], b2=[15,21], detector_model.py:374-391)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stochastic import drop_connect

# (num_repeat, kernel, stride, expand_ratio, in_filters, out_filters, se_ratio)
_BASE_BLOCKS: Tuple[Tuple[int, int, int, int, int, int, float], ...] = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)

# variant -> (width_mult, depth_mult, train_res, dropout)
_VARIANTS: Dict[str, Tuple[float, float, int, float]] = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

BN_MOMENTUM = 0.99  # TF convention (torch equivalent: momentum=0.01)
BN_EPS = 1e-3


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    """TF channel rounding: scale, snap to multiple of 8, never drop below 90%."""
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    kernel: int
    stride: int
    expand_ratio: int
    in_filters: int
    out_filters: int
    se_ratio: float
    expand_filters: int = 0  # explicit expanded width; 0 = in_filters * expand_ratio
    #   (used by the tpu_optimized dense-width remap, where E is decoupled from
    #   the block I/O widths so capacity survives the 128-multiple rounding)

    @property
    def expanded(self) -> int:
        return self.expand_filters or self.in_filters * self.expand_ratio


def scaled_block_args(variant: str) -> List[BlockArgs]:
    """Fully-unrolled per-block args for a variant (after width/depth scaling)."""
    width, depth, _, _ = _VARIANTS[variant]
    out: List[BlockArgs] = []
    for (r, k, s, e, i, o, se) in _BASE_BLOCKS:
        i_s, o_s = round_filters(i, width), round_filters(o, width)
        reps = round_repeats(r, depth)
        for j in range(reps):
            out.append(
                BlockArgs(
                    kernel=k,
                    stride=s if j == 0 else 1,
                    expand_ratio=e,
                    in_filters=i_s if j == 0 else o_s,
                    out_filters=o_s,
                    se_ratio=se,
                )
            )
    return out


def tpu_optimized_block_args(
    variant: str,
    dense_widths: bool = True,
    slim_stage3: int = 0,
    slim_stage5: int = 0,
    slim_stage6: int = 0,
    slim_stage4: int = 0,
    slim_stage7: int = 0,
) -> Tuple[List[BlockArgs], int]:
    """Deep-stage BlockArgs for the ``tpu_optimized`` layout, plus the number
    of replaced shallow blocks (``skip``).

    The space-to-depth front end replaces the stem and every block above 1/4
    scale; the first surviving block's entry is rewired to C=128 / e=2, the
    dense-width remap snaps widths to 128-multiples, and the slim overrides
    apply the promoted/probed capacity trims. Shared by
    ``EfficientNet.__call__`` and ``benchmarks/roofline_ledger.py`` so the
    byte accounting always matches what the model actually builds."""
    args = scaled_block_args(variant)
    sc = 2
    skip = 0
    for a in args:
        if sc > 4 or (sc == 4 and a.stride > 1):
            break
        sc *= a.stride
        skip += 1
    entry = args[skip]
    args = [dataclasses.replace(entry, in_filters=128, expand_ratio=2)] + args[skip + 1:]
    if dense_widths:
        # lane-dense deep stages: snap I/O widths to the nearest 128-multiple,
        # snap the expanded width to the nearest too — same bytes where
        # rounding goes up (the pad becomes real capacity), 1.5-2x fewer where
        # it goes down (see the tpu_dense_widths flag doc)
        def _nearest128(c: int) -> int:
            lo = max(128, (c // 128) * 128)
            return lo if (c - lo) <= (lo + 128 - c) else lo + 128

        args = [
            dataclasses.replace(
                a,
                in_filters=_nearest128(a.in_filters),
                out_filters=_nearest128(a.out_filters),
                expand_filters=_nearest128(a.expanded),
            )
            for a in args
        ]
    if slim_stage3:
        args = [
            dataclasses.replace(a, expand_filters=slim_stage3)
            if (a.kernel == 5 and a.expanded == 384) else a
            for a in args
        ]
    if slim_stage5:
        tgt = 1024 if dense_widths else 1056
        args = [
            dataclasses.replace(a, expand_filters=slim_stage5)
            if (a.kernel == 5 and a.expanded == tgt) else a
            for a in args
        ]
    if slim_stage6:
        tgt = 1792 if dense_widths else 1824
        args = [
            dataclasses.replace(a, expand_filters=slim_stage6)
            if (a.kernel == 5 and a.expanded == tgt) else a
            for a in args
        ]
    if slim_stage4:
        # stage4's expanded width is 768 (128*6) with or without the dense
        # remap — already a 128-multiple
        args = [
            dataclasses.replace(a, expand_filters=slim_stage4)
            if (a.kernel == 3 and a.expanded == 768) else a
            for a in args
        ]
    if slim_stage7:
        # stage7's expanded width is 3072 (512*6), already lane-dense
        args = [
            dataclasses.replace(a, expand_filters=slim_stage7)
            if (a.kernel == 3 and a.expanded == 3072) else a
            for a in args
        ]
    return args, skip


def stem_filters(variant: str) -> int:
    return round_filters(32, _VARIANTS[variant][0])


def head_filters(variant: str) -> int:
    return round_filters(1280, _VARIANTS[variant][0])


def default_detector_taps(variant: str) -> Tuple[int, int]:
    """Block indices tapped (block OUTPUT) as C3/C4 by the RetinaNet factory; C5 is the
    conv-head output.

    Reference: detector_model.py:374-391 hardcodes b5 source_layer_indexes [26,37]
    (channels 176/512) and b2 [15,21] (channels 120/352); efficient_net.py:217-237 takes
    the tapped block's output. For other variants we pick the analogous positions: the
    last block of the 112-filter stage and the last block of the 320-filter stage.
    """
    if variant == "b5":
        return (26, 37)
    if variant == "b2":
        return (15, 21)
    args = scaled_block_args(variant)
    width = _VARIANTS[variant][0]
    s5_out = round_filters(112, width)
    last_s5 = max(i for i, a in enumerate(args) if a.out_filters == s5_out)
    return (last_s5, len(args) - 1)


def tap_channels(variant: str, taps: Sequence[int]) -> List[int]:
    args = scaled_block_args(variant)
    return [args[t].out_filters for t in taps] + [head_filters(variant)]


class SqueezeExcite(nn.Module):
    """SE block; squeeze width derived from the block's INPUT filters (lukemelas
    semantics, reference: efficientnet_custom.py MBConvBlock ctor)."""

    in_filters: int
    se_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeezed = max(1, int(self.in_filters * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(squeezed, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * jax.nn.sigmoid(s)


class _MirrorConv(nn.Module):
    """Declares the exact param tree an nn.Conv would, without running the conv —
    lets the fused Pallas path consume raw kernels while staying checkpoint-
    identical to the Flax path (same names, shapes, initializers)."""

    shape: Tuple[int, ...]  # (kh, kw, in_per_group, out)
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        if self.use_bias:
            return k, self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],))
        return k, None


class _MirrorBN(nn.Module):
    """Param/batch_stats tree of an nn.BatchNorm (scale/bias + mean/var)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class _MirrorSE(nn.Module):
    """Param tree of SqueezeExcite (reduce/expand 1x1 convs with bias)."""

    channels: int
    squeezed: int

    @nn.compact
    def __call__(self):
        w1, b1 = _MirrorConv((1, 1, self.channels, self.squeezed), use_bias=True,
                             name="reduce")()
        w2, b2 = _MirrorConv((1, 1, self.squeezed, self.channels), use_bias=True,
                             name="expand")()
        return w1, b1, w2, b2


class MBConvBlock(nn.Module):
    """One MBConv block.

    ``packed_in_hw`` / ``packed_out`` implement lane-compact I/O: a bf16 NHWC tensor
    with C < 128 pads its lane dimension to 128 in HBM (up to 5.3x wasted bytes for
    C=24), and with remat the block INPUT is exactly the residual XLA keeps alive.
    Packing the boundary tensors as (N, H, W*C) makes the saved residuals compact,
    which is what unlocks batch sizes > 8 on a 16 GB chip. Pure reshapes — the param
    tree and the math are unchanged (checkpoint-compatible).

    ``fused_nchw`` routes the block through the fused Pallas megakernel
    (ops/mbconv_pallas.py): input/output are NCHW (lane-compact for C < 128), the
    whole chain runs in three phased kernels per direction, and train-mode BN
    batch statistics are exact. Only e=1 / k=3 / stride-1 blocks qualify; eval
    mode transposes to NHWC and takes the Flax path (running-average BN). The
    param tree is identical either way (_Mirror* declare the same leaves)."""

    args: BlockArgs
    drop_rate: float
    dtype: Any = jnp.float32
    packed_in_hw: Tuple[int, int] = ()  # (H, W) when the input arrives packed
    packed_out: bool = False  # emit (N, H, W*C) instead of NHWC
    fused_nchw: bool = False  # I/O in NCHW; train uses the Pallas megakernel
    fused_valid_hw: Tuple[int, int] = ()  # (valid_h, valid_w) when the NCHW
    #   input arrives zero-padded for the fused run (tile-height / 128-lane
    #   alignment); the kernel masks the pad region and zeroes it on output
    s2d_nhwc: bool = False  # input arrives space-to-depth'd (N,H/2,W/2,4C),
    #   channel-major — execute the SAME block math 4x lane-denser
    #   (ops/s2d_exec.py); stride-2 blocks consume the layout (base-res output)
    quant_int8: bool = False  # run the block's 1x1 expand/project convs as
    #   int8 MXU matmuls (ops/quant.py): dynamic symmetric scales, int32
    #   accumulation, straight-through bf16 gradients. Param tree unchanged
    #   (_MirrorConv declares the same kernel leaf).

    def _fused_params(self):
        from ..ops.mbconv_pallas import MBConvParams

        a = self.args
        c1 = a.in_filters
        sq = max(1, int(a.in_filters * a.se_ratio))
        dw, _ = _MirrorConv((a.kernel, a.kernel, 1, c1), name="depthwise_conv")()
        g1, b1, m1, v1 = _MirrorBN(c1, name="bn1")()
        w1, sb1, w2, sb2 = _MirrorSE(c1, sq, name="se")()
        wp, _ = _MirrorConv((1, 1, c1, a.out_filters), name="project_conv")()
        g2, b2, m2, v2 = _MirrorBN(a.out_filters, name="bn2")()
        params = MBConvParams(
            dw_kernel=jnp.transpose(dw[:, :, 0, :], (2, 0, 1)),  # (C,3,3)
            gamma1=g1, beta1=b1,
            se_w1=w1[0, 0], se_b1=sb1, se_w2=w2[0, 0], se_b2=sb2,
            wp=wp[0, 0],
            gamma2=g2, beta2=b2,
        )
        return params, (m1, v1, m2, v2)

    def _fused_params6(self):
        from ..ops.mbconv6_pallas import MBConv6Params

        a = self.args
        c1 = a.in_filters
        e = c1 * a.expand_ratio
        sq = max(1, int(a.in_filters * a.se_ratio))
        we, _ = _MirrorConv((1, 1, c1, e), name="expand_conv")()
        g0, b0, m0, v0 = _MirrorBN(e, name="bn0")()
        dw, _ = _MirrorConv((a.kernel, a.kernel, 1, e), name="depthwise_conv")()
        g1, b1, m1, v1 = _MirrorBN(e, name="bn1")()
        w1, sb1, w2, sb2 = _MirrorSE(e, sq, name="se")()
        wp, _ = _MirrorConv((1, 1, e, a.out_filters), name="project_conv")()
        g2, b2, m2, v2 = _MirrorBN(a.out_filters, name="bn2")()
        params = MBConv6Params(
            we=we[0, 0],
            gamma0=g0, beta0=b0,
            dw_kernel=jnp.transpose(dw[:, :, 0, :], (2, 0, 1)),  # (E,3,3)
            gamma1=g1, beta1=b1,
            se_w1=w1[0, 0], se_b1=sb1, se_w2=w2[0, 0], se_b2=sb2,
            wp=wp[0, 0],
            gamma2=g2, beta2=b2,
        )
        return params, ((m0, v0), (m1, v1), (m2, v2))

    def _drop_delta(self, n: int) -> jnp.ndarray:
        if self.drop_rate > 0.0 and not self.is_initializing():
            keep = 1.0 - self.drop_rate
            mask = jax.random.bernoulli(self.make_rng("stochastic"), p=keep, shape=(n,))
            return mask.astype(jnp.float32) / keep
        return jnp.ones((n,), jnp.float32)


    def _fused_call(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """x: (N, C, H, W), possibly zero-padded to (Hpad, Wpad) with
        ``fused_valid_hw`` carrying the real dims. Pallas path in train mode;
        Flax path (transposed, pads stripped/restored) in eval."""
        from ..ops.mbconv_pallas import BN_EPS as _EPS
        from ..ops.mbconv6_pallas import fused_mbconv_e6

        a = self.args
        n, _, hp, wp = x.shape
        vh, vw = self.fused_valid_hw or (hp, wp)
        if not train:
            out = self._flax_call(jnp.transpose(x[:, :, :vh, :vw], (0, 2, 3, 1)),
                                  train)
            out = jnp.transpose(out, (0, 3, 1, 2))
            if (vh, vw) != (hp, wp):  # keep the run's zero-pad contract
                out = jnp.pad(out, ((0, 0), (0, 0), (0, hp - vh), (0, wp - vw)))
            return out
        delta = self._drop_delta(n)
        interpret = jax.default_backend() == "cpu"
        if a.expand_ratio == 1:
            params, (m1, v1, m2, v2) = self._fused_params()
            out, (mean1, var1, mean2, var2) = fused_mbconv_e6(
                x, params, delta, vh, vw, _EPS, interpret
            )
            updates = [(m1, mean1), (v1, var1), (m2, mean2), (v2, var2)]
        else:
            params, ((m0, v0), (m1, v1), (m2, v2)) = self._fused_params6()
            out, stats = fused_mbconv_e6(x, params, delta, vh, vw, _EPS, interpret)
            (mean0, var0, mean1, var1, mean2, var2) = stats
            updates = [(m0, mean0), (v0, var0), (m1, mean1), (v1, var1),
                       (m2, mean2), (v2, var2)]
        if not self.is_initializing():
            m = BN_MOMENTUM
            for var, new in updates:
                var.value = m * var.value + (1 - m) * new
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = self.args
        if self.fused_nchw:
            assert a.kernel == 3 and a.stride == 1
            return self._fused_call(x, train)
        if self.s2d_nhwc:
            assert a.kernel in (3, 5)
            return self._s2d_call(x, train)
        return self._flax_call(x, train)

    def _bn_s2d(self, t, name: str, train: bool, phases: bool):
        """BatchNorm with nn.BatchNorm's exact semantics over the s2d layout
        (``phases``: stats fold the 4 phases of each original channel)."""
        from ..ops.s2d_exec import phase_broadcast, phase_stats

        features = t.shape[-1] // (4 if phases else 1)
        scale, bias, mean_v, var_v = _MirrorBN(features, name=name)()
        if train:
            if phases:
                mean, var = phase_stats(t)
            else:
                tf32 = t.astype(jnp.float32)
                mean = jnp.mean(tf32, axis=(0, 1, 2))
                var = jnp.maximum(
                    jnp.mean(jnp.square(tf32), axis=(0, 1, 2)) - jnp.square(mean),
                    0.0)
            if not self.is_initializing():
                m = BN_MOMENTUM
                mean_v.value = m * mean_v.value + (1 - m) * mean
                var_v.value = m * var_v.value + (1 - m) * var
        else:
            mean, var = mean_v.value, var_v.value
        inv = jax.lax.rsqrt(var + BN_EPS) * scale
        shift = bias - mean * inv
        if phases:
            inv, shift = phase_broadcast(inv), phase_broadcast(shift)
        return (t * inv.astype(self.dtype) + shift.astype(self.dtype)).astype(
            self.dtype)

    def _s2d_call(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Execute the block over the space-to-depth layout (exact math, 4x
        lane-denser tensors — see ops/s2d_exec.py). Input (N, H/2, W/2, 4*Cin);
        output s2d for stride-1 blocks, base-resolution NHWC for stride-2."""
        from ..ops.s2d_exec import (
            dw_kernel_s2d_dense,
            phase_broadcast,
            phase_mix_1x1,
            phase_spatial_mean,
        )

        a = self.args
        inputs = x
        expanded = a.in_filters * a.expand_ratio
        if a.expand_ratio != 1:
            we, _ = _MirrorConv((1, 1, a.in_filters, expanded),
                                name="expand_conv")()
            x = phase_mix_1x1(x, we.astype(self.dtype)[0, 0])
            x = self._bn_s2d(x, "bn0", train, phases=True)
            x = jax.nn.silu(x)
        dw, _ = _MirrorConv((a.kernel, a.kernel, 1, expanded),
                            name="depthwise_conv")()
        dw = dw.astype(self.dtype)
        # XLA's in_per_group=4 grouped conv mis-lays-out a rank-5 intermediate
        # (see dw_kernel_s2d_dense): narrow blocks use the dense-embedded base
        # conv; wide (expanded) blocks sandwich the standard depthwise between
        # depth_to_space / space_to_depth — their tensors are lane-dense anyway
        if a.stride == 1:
            assert 4 * expanded <= 128, "wide stride-1 blocks don't use s2d"
            x = jax.lax.conv_general_dilated(
                x, dw_kernel_s2d_dense(dw), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            s2d_out = True
        else:
            from ..ops.s2d_exec import depth_to_space

            xf = depth_to_space(x)
            xf = jax.lax.conv_general_dilated(
                xf, dw, (a.stride, a.stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=expanded)
            x = xf
            s2d_out = False  # stride-2 output lands at base resolution
        x = self._bn_s2d(x, "bn1", train, phases=s2d_out)
        x = jax.nn.silu(x)
        if 0.0 < a.se_ratio <= 1.0:
            sq = max(1, int(a.in_filters * a.se_ratio))
            w1, b1, w2, b2 = _MirrorSE(expanded, sq, name="se")()
            if s2d_out:
                s = phase_spatial_mean(x)  # (N, E) over space AND phases
            else:
                s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
            s = s.astype(self.dtype)
            g = jax.nn.silu(s @ w1[0, 0].astype(self.dtype) + b1.astype(self.dtype))
            g = jax.nn.sigmoid(g @ w2[0, 0].astype(self.dtype) + b2.astype(self.dtype))
            if s2d_out:
                g = jnp.repeat(g, 4, axis=-1)  # per-channel gate across phases
            x = x * g[:, None, None, :]
        wp, _ = _MirrorConv((1, 1, expanded, a.out_filters),
                            name="project_conv")()
        wpk = wp.astype(self.dtype)[0, 0]
        if s2d_out:
            x = phase_mix_1x1(x, wpk)
        else:
            x = jnp.einsum("nhwe,ec->nhwc", x, wpk)
        x = self._bn_s2d(x, "bn2", train, phases=s2d_out)
        if a.stride == 1 and a.in_filters == a.out_filters:
            if train and self.drop_rate > 0.0:
                x = drop_connect(x, self.make_rng("stochastic"), self.drop_rate,
                                 deterministic=False)
            x = x + inputs
        return x

    def _flax_call(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = self.args
        if self.packed_in_hw:
            h_in, w_in = self.packed_in_hw
            x = x.reshape(x.shape[0], h_in, w_in, a.in_filters)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name=name,
        )
        inputs = x
        expanded = a.expanded
        if expanded != a.in_filters:
            if self.quant_int8:
                from ..ops.quant import int8_conv1x1

                we, _ = _MirrorConv((1, 1, a.in_filters, expanded),
                                    name="expand_conv")()
                x = int8_conv1x1(x, we, out_dtype=self.dtype)
            else:
                x = nn.Conv(expanded, (1, 1), use_bias=False, dtype=self.dtype,
                            name="expand_conv")(x)
            x = bn("bn0")(x)
            x = jax.nn.silu(x)
        x = nn.Conv(
            expanded,
            (a.kernel, a.kernel),
            strides=(a.stride, a.stride),
            padding="SAME",
            feature_group_count=expanded,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = bn("bn1")(x)
        x = jax.nn.silu(x)
        if 0.0 < a.se_ratio <= 1.0:
            x = SqueezeExcite(a.in_filters, a.se_ratio, dtype=self.dtype, name="se")(x)
        if self.quant_int8:
            from ..ops.quant import int8_conv1x1

            wp, _ = _MirrorConv((1, 1, expanded, a.out_filters),
                                name="project_conv")()
            x = int8_conv1x1(x, wp, out_dtype=self.dtype)
        else:
            x = nn.Conv(a.out_filters, (1, 1), use_bias=False, dtype=self.dtype,
                        name="project_conv")(x)
        x = bn("bn2")(x)
        if a.stride == 1 and a.in_filters == a.out_filters:
            if train and self.drop_rate > 0.0:
                x = drop_connect(x, self.make_rng("stochastic"), self.drop_rate, deterministic=False)
            x = x + inputs
        if self.packed_out:
            n, ho, wo, co = x.shape
            x = x.reshape(n, ho, wo * co)
        return x


class EfficientNet(nn.Module):
    """Headless EfficientNet feature extractor (see module docstring for the contract)."""

    variant: str = "b5"
    in_channels: int = 1  # grayscale mammograms (reference: _change_in_channels,
    #                        efficientnet_custom.py:402-411)
    drop_connect_rate: float = 0.2
    feature_taps: Tuple[int, ...] = ()
    remat: bool = False  # rematerialize MBConv blocks (trades FLOPs for HBM;
    #                       replaces the reference's MemoryEfficientSwish + HF
    #                       gradient-checkpointing knobs)
    remat_max_reduction: int = 16  # with remat on, only blocks at spatial scale
    #   1/2..1/remat_max_reduction are rematerialized: the shallow stages hold the
    #   big activations (HBM pressure) while the deep 1/32 stages hold most params;
    #   selective remat saves the memory without recomputing the deep stages.
    packed_residuals: bool = False  # with remat on, store the remat-saved block
    #   inputs lane-compact as (N, H, W*C) — see MBConvBlock docstring. Math- and
    #   checkpoint-identical; cuts the dominant HBM residency up to 5.3x.
    fused_mbconv: bool = False  # route qualifying early-stage blocks (e=1, k=3,
    #   s=1) through the fused Pallas megakernel in NCHW (ops/mbconv_pallas.py):
    #   ~4-6x less HBM traffic on the stage-1 blocks that dominate the step.
    #   Checkpoint-identical params; exact train-BN semantics; Flax path for eval.
    #   Measured slower than XLA on this toolchain (BASELINE.md) — opt-in only.
    s2d_exec: bool = False  # execute k=3 blocks over a space-to-depth(2)
    #   layout (ops/s2d_exec.py): the SAME network function with the SAME
    #   parameters, but every early-stage tensor is 4x lane-denser, cutting the
    #   padded HBM traffic that dominates the step (BASELINE.md round-2
    #   profile). Checkpoint-compatible; stride-2 blocks naturally exit the
    #   layout and the next k=3 stage re-enters it.
    tpu_optimized: bool = False  # OPT-IN, trains from scratch, NOT checkpoint-
    #   compatible with the reference: replaces stem + stages 1-2 (the narrow-
    #   channel feature maps whose bf16 lane padding wastes up to 5.3x HBM bytes
    #   at 456x760) with space-to-depth(4) -> conv3x3 to C=128 -> two MBConv(e=2,
    #   C=128) blocks at 1/4 resolution — fully lane-dense and MXU-friendly.
    #   Stages 3+ keep the reference topology apart from stage 3's entry block
    #   taking C=128 (expand_ratio 2, same expanded width ballpark as the
    #   original 240) and, with ``tpu_dense_widths``, the 128-multiple width
    #   remap below. feature_taps are allowed at DEEP blocks (>= the replaced
    #   front) — the detector's b5 [26,37] taps qualify, so flagship
    #   checkpoints back the downstream detector too (tap widths follow the
    #   dense remap).
    tpu_front_blocks: int = 2  # with tpu_optimized: number of MBConv blocks in
    #   the space-to-depth front end (each C=128 at 1/4 resolution)
    tpu_front_expand: int = 1  # their expand_ratio. The front is ~20% of the
    #   r3 step at its byte-roofline (BASELINE.md r3 profile: 70 ms, 100%
    #   HBM-bound at 613 GiB/s), so e and block count are the front's only
    #   perf levers. Measured on chip (BASELINE.md r3 front A/B): e1x2 289 ms
    #   (55.4 img/s) vs e2x1 294.7 vs e2x2 327 — e=1 (no expanded tensors,
    #   half the front bytes) wins and keeps both spatial-mixing layers;
    #   learning-quality gate: tests/test_clip_learns.py flagship param.
    tpu_dense_widths: bool = True  # with tpu_optimized: remap the deep stages'
    #   widths so NO tensor carries bf16 lane padding — block I/O widths snap to
    #   the NEAREST 128-multiple (B5: 64->128, 176->128, 304->256, 512 stays)
    #   while each block's EXPANDED width (the capacity carrier) also snaps to
    #   the NEAREST 128-multiple (1056->1024, 1824->1792; never below 128).
    #   I/O bytes for the k5-heavy stages 5/6 drop 2x/1.5x and the expanded
    #   tensors stop paying pad bytes — the r2 profile's
    #   "architecture-intrinsic" lane pads eliminated (VERDICT r2 #2).
    #   False reproduces the round-2 flagship exactly.
    tpu_slim_stage3: int = 0  # with tpu_optimized: override the expanded width
    #   of the E=384 k5 stage (B5 stage3 — the r3 profile's biggest component,
    #   64 ms, 100% HBM-bound; ROADMAP #2). e.g. 256 cuts that stage's bytes
    #   ~1/3. This is a CAPACITY cut, not a layout fix: opt-in, quality-gated
    #   only by the toy bar (tests/test_clip_learns.py); real-data evidence
    #   pending egress. 0 = off (default recipe).
    tpu_slim_stage5: int = 0  # same probe for the k5 blocks whose EXPANDED
    #   width is 1024 under the dense remap (1056 without it): B5 stage5's
    #   in-stage blocks 21-26 AND the stage6 entry block 27, which expands at
    #   the same 1/16 resolution — together the flagship profile's
    #   second-biggest component (47 ms; ROADMAP r3 #3 names it the next
    #   capacity-cut candidate). e.g. 768 cuts those expanded bytes 25%.
    #   Opt-in, same quality caveats as tpu_slim_stage3. 0 = off (default).
    tpu_slim_stage6: int = 0  # same probe for the k5 blocks whose EXPANDED
    #   width is 1792 under the dense remap (1824 without it): B5 stage6's
    #   in-stage blocks 28-35 (the stage7 entry block expands at the same
    #   width but is k3 and excluded). The r3-final profile puts stage6 at
    #   27 ms / 75% HBM-bound — the next capacity-cut candidate after the
    #   promoted stage3/5 trims (e.g. 1536 cuts those expanded bytes ~14%).
    #   Opt-in pending its own quality arm. 0 = off (default).
    tpu_slim_stage4: int = 0  # same probe for the k3 blocks whose EXPANDED
    #   width is 768 (128*6, already lane-dense): B5 stage4's
    #   in-stage blocks 14-19 (the stage5 entry block 20 expands at the same
    #   width but is k5 and excluded; the stage4 entry block 13 expands at
    #   384 and is untouched). The r3 promoted-recipe profile puts stage4 at
    #   27.8 ms / 95% HBM-bound — the remaining capacity-cut candidate beside
    #   stage6 (e.g. 512 cuts those expanded bytes ~1/3). Opt-in pending its
    #   own quality arm. 0 = off (default).
    tpu_slim_stage7: int = 0  # same probe for the k3 blocks whose EXPANDED
    #   width is 3072 (512*6, already lane-dense): B5 stage7's in-stage
    #   blocks 37-38. Smallest candidate (stage7 is 12.8 ms / 61% HBM-bound
    #   in the r3 profile) and the closest stage to the head features —
    #   probe last. Opt-in pending its own quality arm. 0 = off (default).
    quant_int8_k5: bool = False  # run the k5 stages' (B5: stages 3/5/6) 1x1
    #   expand/project convs as int8 MXU matmuls (ops/quant.py; VERDICT r2 #5,
    #   v5e int8 MXU). Checkpoint-identical param tree; forward-only
    #   quantization with straight-through gradients. Opt-in experiment —
    #   measured numbers in BASELINE.md.
    pooling: str = "avg"  # 'avg' (lukemelas path) or 'gem' (the reference's timm
    #   EfficientNet_Mammo GeM(p=3) option, image_encoder.py:95-116)
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return head_filters(self.variant)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        assert x.ndim == 4 and x.shape[-1] == self.in_channels, (
            f"expected NHWC with C={self.in_channels}, got {x.shape}"
        )
        args = scaled_block_args(self.variant)
        n_blocks = len(args)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name=name,
        )

        x = x.astype(self.dtype)
        block_offset = 0
        if self.tpu_optimized:
            assert not (self.s2d_exec or self.fused_mbconv), (
                "tpu_optimized is its own layout regime")
            n, h, w, c = x.shape
            assert h % 4 == 0 and w % 4 == 0, f"space-to-depth(4) needs /4 dims, got {x.shape}"
            # space-to-depth(4): (N, H/4, W/4, 16*C) — every tensor from here on
            # has C >= 128, so bf16 lanes are dense
            x = x.reshape(n, h // 4, 4, w // 4, 4, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c)
            x = nn.Conv(128, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="tpu_stem_conv")(x)
            x = jax.nn.silu(bn("tpu_stem_bn")(x))
            front = BlockArgs(kernel=3, stride=1,
                              expand_ratio=self.tpu_front_expand,
                              in_filters=128, out_filters=128, se_ratio=0.25)
            for j in range(self.tpu_front_blocks):
                x = MBConvBlock(front, drop_rate=0.0, dtype=self.dtype,
                                name=f"tpu_front_block_{j}")(x, train)
            # drop the original stem + every block above 1/4 scale; stage 3's
            # entry block now takes C=128 at a comparable expanded width (e=2)
            args, skip = tpu_optimized_block_args(
                self.variant,
                dense_widths=self.tpu_dense_widths,
                slim_stage3=self.tpu_slim_stage3,
                slim_stage5=self.tpu_slim_stage5,
                slim_stage6=self.tpu_slim_stage6,
                slim_stage4=self.tpu_slim_stage4,
                slim_stage7=self.tpu_slim_stage7,
            )
            # taps at deep blocks (>= skip) survive the front-end replacement —
            # the detector's b5 [26,37] taps both live in stages 5/7 (original
            # block numbering is preserved for deep blocks)
            assert all(t >= skip for t in self.feature_taps), (
                f"tpu_optimized replaces blocks < {skip}; "
                f"feature_taps {self.feature_taps} reach into the removed front")
            block_offset = skip
        else:
            x = nn.Conv(
                stem_filters(self.variant),
                (3, 3),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name="stem_conv",
            )(x)
            x = jax.nn.silu(bn("stem_bn")(x))

        # Endpoint naming matches the reference's extract_endpoints
        # (efficientnet_custom.py:226-260): reduction_k is the last feature map at scale
        # 1/2^k for k=1..5, and reduction_6 is the conv-head output (1/32).
        endpoints: Dict[str, jnp.ndarray] = {}
        taps: List[jnp.ndarray] = []
        prev = x
        remat_cls = nn.remat(MBConvBlock, static_argnums=(2,))
        scale = 4 if self.tpu_optimized else 2  # stem is stride 2 (s2d(4) in the variant)
        # packed-boundary bookkeeping: when x is packed it is (N, H, W*C) and
        # (cur_h, cur_w, cur_c) carries the logical shape (all static at trace time)
        cur_h, cur_w, cur_c = x.shape[1], x.shape[2], x.shape[3]
        x_packed = False

        x_nchw = False
        x_s2d = False  # NHWC space-to-depth layout (s2d_exec runs)
        pad_hw = None  # (hpad, wpad) while x carries the fused run's zero pads
        assert not (self.s2d_exec and (self.fused_mbconv or self.packed_residuals)), \
            "s2d_exec is its own layout regime"

        def unpacked(t):
            if x_packed:
                return t.reshape(t.shape[0], cur_h, cur_w, cur_c)
            if x_nchw:
                if pad_hw is not None:
                    t = t[:, :, :cur_h, :cur_w]
                return jnp.transpose(t, (0, 2, 3, 1))
            if x_s2d:
                from ..ops.s2d_exec import depth_to_space

                return depth_to_space(t)
            return t

        # kernel row-merges are reshapes only at 128-multiple widths; the CPU
        # interpreter has no such constraint (tests skip the W padding there)
        lane_free = jax.default_backend() == "cpu"

        def fused_ok(a_):
            if not (self.fused_mbconv and a_.kernel == 3 and a_.stride == 1):
                return False
            # both block forms go through ops/mbconv6_pallas (pad+mask dims);
            # cap the expanded width so the deep stages (small maps, huge E,
            # lane-dense in NHWC anyway) stay on the XLA path
            return a_.in_filters * a_.expand_ratio <= 256

        from ..ops.mbconv6_pallas import pick_h_pad, pick_w_pad

        def s2d_ok(a_):
            # where the byte-count wins (see ops/s2d_exec.py): narrow stride-1
            # blocks (dense-embedded depthwise, 4*E <= 128) and stride-2
            # entries (expand/bn/silu run lane-dense, the depthwise exits the
            # layout one-way). Wide stride-1 blocks would need a d2s/s2d
            # sandwich around the depthwise that costs more than the narrow-
            # I/O savings — excluded.
            if not (self.s2d_exec and a_.kernel in (3, 5)
                    and cur_h % 2 == 0 and cur_w % 2 == 0):
                return False
            return (a_.stride == 2
                    or 4 * a_.in_filters * a_.expand_ratio <= 128)

        for idx0, a in enumerate(args):
            idx = idx0 + block_offset  # original numbering (stable deep-block names)
            rate = self.drop_connect_rate * idx / n_blocks
            use_remat = self.remat and scale <= self.remat_max_reduction
            use_fused = fused_ok(a)
            use_s2d = s2d_ok(a)
            if use_s2d and not x_s2d:
                from ..ops.s2d_exec import space_to_depth

                x = space_to_depth(x)
                x_s2d = True
            if not use_s2d and x_s2d:
                x = unpacked(x)
                x_s2d = False
            if use_fused and not x_nchw:
                x = jnp.transpose(unpacked(x), (0, 3, 1, 2))
                x_packed, x_nchw = False, True
            if not use_fused and x_nchw:
                x = unpacked(x)  # slices the run's pads off before NHWC
                x_nchw, pad_hw = False, None
            if use_fused:
                # pad H/W once per run of fused blocks (each block re-zeroes
                # its pad region, so consecutive blocks chain without repadding)
                wp = pick_w_pad(cur_w) if not lane_free else cur_w
                hp = pick_h_pad(cur_h, a.in_filters * a.expand_ratio, wp,
                                jnp.dtype(self.dtype).itemsize)
                if (hp, wp) != (cur_h, cur_w):
                    if pad_hw is None:
                        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - cur_h),
                                        (0, wp - cur_w)))
                    elif pad_hw != (hp, wp):  # adjacent blocks, different tiling
                        x = x[:, :, :cur_h, :cur_w]
                        x = jnp.pad(x, ((0, 0), (0, 0), (0, hp - cur_h),
                                        (0, wp - cur_w)))
                    pad_hw = (hp, wp)
                elif pad_hw is not None:
                    x = x[:, :, :cur_h, :cur_w]
                    pad_hw = None
            # fused blocks have a recompute-based custom VJP (saved residual = the
            # compact NCHW input) — remat around them would be redundant
            block_cls = remat_cls if (use_remat and not use_fused) else MBConvBlock
            # pack boundaries only where remat keeps the input alive AND the lane
            # dim is actually padded (C % 128 != 0)
            want_packed_out = (
                self.packed_residuals and use_remat and not use_fused
                and a.out_filters % 128 != 0 and not x_nchw and not x_s2d
            )
            if (self.packed_residuals and use_remat and not use_fused
                    and not x_packed and not x_nchw and not x_s2d
                    and cur_c % 128 != 0):
                x = x.reshape(x.shape[0], cur_h, cur_w * cur_c)
                x_packed = True
            # train passed positionally: nn.remat static_argnums counts positional args
            x = block_cls(
                a,
                drop_rate=rate,
                dtype=self.dtype,
                packed_in_hw=(cur_h, cur_w) if x_packed else (),
                packed_out=want_packed_out,
                fused_nchw=x_nchw,
                fused_valid_hw=(cur_h, cur_w) if pad_hw is not None else (),
                s2d_nhwc=x_s2d,
                quant_int8=(self.quant_int8_k5 and a.kernel == 5
                            and not (x_nchw or x_s2d)),
                name=f"block_{idx}",
            )(x, train)
            if x_s2d and a.stride > 1:
                x_s2d = False  # the stride-2 block emitted base-resolution NHWC
            scale *= a.stride
            cur_h = -(-cur_h // a.stride)  # SAME padding: ceil division
            cur_w = -(-cur_w // a.stride)
            cur_c = a.out_filters
            x_packed = want_packed_out
            if a.stride > 1:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            elif idx == n_blocks - 1:
                endpoints[f"reduction_{len(endpoints) + 1}"] = unpacked(x)
            if idx in self.feature_taps:
                taps.append(unpacked(x))
            prev = unpacked(x)
        x = unpacked(x)
        x_nchw = x_s2d = False

        x = nn.Conv(head_filters(self.variant), (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = jax.nn.silu(bn("head_bn")(x))
        endpoints[f"reduction_{len(endpoints) + 1}"] = x

        if self.pooling == "gem":
            from ..ops.pooling import gem_pool

            pooled = gem_pool(x, p=3.0)
        else:
            pooled = jnp.mean(x, axis=(1, 2))
        return {
            "pooled": pooled,
            "features": x,
            "endpoints": endpoints,
            "taps": tuple(taps),
        }
