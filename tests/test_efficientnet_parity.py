"""Numeric forward parity: our Flax EfficientNet vs an independent torch
implementation of the same published spec (TF-SAME asymmetric padding, SE on input
filters, BN eps 1e-3). This is the golden-value test that guards the checkpoint
converter's usefulness: if these numerics match, reference weights loaded through
convert/torch_import.py produce the reference's activations."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mammo_clip_tpu.convert.torch_import import convert_efficientnet
from mammo_clip_tpu.models.efficientnet import EfficientNet, scaled_block_args


def tf_same_pad(x, k, s):
    """TF SAME padding (asymmetric: extra on bottom/right), the semantics of the
    reference's Conv2dStaticSamePadding."""
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])


class TorchEffNet(torch.nn.Module):
    """Minimal torch EfficientNet matching the published spec, parameterized from a
    reference-style state dict (built in the test, loaded by name)."""

    def __init__(self, variant="b0", in_ch=1):
        super().__init__()
        from mammo_clip_tpu.models.efficientnet import head_filters, stem_filters

        self.args = scaled_block_args(variant)
        self.stem = torch.nn.Conv2d(in_ch, stem_filters(variant), 3, 2, bias=False)
        self.bn0 = torch.nn.BatchNorm2d(stem_filters(variant), eps=1e-3)
        self.blocks = torch.nn.ModuleList()
        for a in self.args:
            exp = a.in_filters * a.expand_ratio
            se = max(1, int(a.in_filters * a.se_ratio))
            mods = torch.nn.ModuleDict()
            if a.expand_ratio != 1:
                mods["expand"] = torch.nn.Conv2d(a.in_filters, exp, 1, bias=False)
                mods["bn0"] = torch.nn.BatchNorm2d(exp, eps=1e-3)
            mods["dw"] = torch.nn.Conv2d(exp, exp, a.kernel, a.stride, groups=exp, bias=False)
            mods["bn1"] = torch.nn.BatchNorm2d(exp, eps=1e-3)
            mods["se_r"] = torch.nn.Conv2d(exp, se, 1)
            mods["se_e"] = torch.nn.Conv2d(se, exp, 1)
            mods["proj"] = torch.nn.Conv2d(exp, a.out_filters, 1, bias=False)
            mods["bn2"] = torch.nn.BatchNorm2d(a.out_filters, eps=1e-3)
            self.blocks.append(mods)
        last = self.args[-1].out_filters
        self.head = torch.nn.Conv2d(last, head_filters(variant), 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(head_filters(variant), eps=1e-3)

    def forward(self, x):
        sw = torch.nn.functional.silu
        x = sw(self.bn0(self.stem(tf_same_pad(x, 3, 2))))
        for a, m in zip(self.args, self.blocks):
            inp = x
            if a.expand_ratio != 1:
                x = sw(m["bn0"](m["expand"](x)))
            x = sw(m["bn1"](m["dw"](tf_same_pad(x, a.kernel, a.stride))))
            s = x.mean((2, 3), keepdim=True)
            s = torch.sigmoid(m["se_e"](sw(m["se_r"](s))))
            x = x * s
            x = m["bn2"](m["proj"](x))
            if a.stride == 1 and a.in_filters == a.out_filters:
                x = x + inp
        x = sw(self.bn1(self.head(x)))
        return x

    def reference_state_dict(self):
        """Rename to the reference checkpoint's naming scheme
        (image_encoder._conv_stem / _blocks.i._expand_conv / ...)."""
        out = {}

        def put(prefix, mod, conv=True):
            if conv:
                out[prefix + ".weight"] = mod.weight.detach()
                if mod.bias is not None:
                    out[prefix + ".bias"] = mod.bias.detach()
            else:
                out[prefix + ".weight"] = mod.weight.detach()
                out[prefix + ".bias"] = mod.bias.detach()
                out[prefix + ".running_mean"] = mod.running_mean.detach()
                out[prefix + ".running_var"] = mod.running_var.detach()

        p = "image_encoder."
        put(p + "_conv_stem", self.stem)
        put(p + "_bn0", self.bn0, conv=False)
        for i, (a, m) in enumerate(zip(self.args, self.blocks)):
            b = f"{p}_blocks.{i}."
            if a.expand_ratio != 1:
                put(b + "_expand_conv", m["expand"])
                put(b + "_bn0", m["bn0"], conv=False)
            put(b + "_depthwise_conv", m["dw"])
            put(b + "_bn1", m["bn1"], conv=False)
            put(b + "_se_reduce", m["se_r"])
            put(b + "_se_expand", m["se_e"])
            put(b + "_project_conv", m["proj"])
            put(b + "_bn2", m["bn2"], conv=False)
        put(p + "_conv_head", self.head)
        put(p + "_bn1", self.bn1, conv=False)
        return out


@pytest.mark.parametrize("hw", [(64, 64), (95, 57)])  # odd sizes exercise SAME asymmetry
def test_efficientnet_forward_parity_b0(hw):
    torch.manual_seed(0)
    tm = TorchEffNet("b0").eval()
    # randomize BN stats so the normalization path is non-trivial
    for mod in tm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.6, 1.4)

    H, W = hw
    x = torch.randn(2, 1, H, W)
    with torch.no_grad():
        ref = tm(x).numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    params, stats = convert_efficientnet(tm.reference_state_dict(), "image_encoder.")
    model = EfficientNet(variant="b0", in_channels=1)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False,
    )
    got = np.asarray(out["features"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
    # pooled vector too (the CLIP/classifier contract)
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), ref.mean((1, 2)), atol=2e-4, rtol=2e-3
    )
