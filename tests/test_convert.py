"""Checkpoint converter tests: layout conversions vs torch ground truth, BERT numerics
vs HF BertModel, and full reference-named state-dict round trip into MammoCLIP."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mammo_clip_tpu.convert.torch_import import (
    convert_bert,
    convert_efficientnet,
    convert_state_dict,
)
from mammo_clip_tpu.models.bert import BertConfig, BertEncoder
from mammo_clip_tpu.models.clip import MammoCLIP
from mammo_clip_tpu.models.efficientnet import EfficientNet, scaled_block_args, head_filters, stem_filters


def test_conv_layout_conversion():
    import flax.linen as fnn

    torch.manual_seed(0)
    conv_t = torch.nn.Conv2d(3, 8, 3, stride=1, padding=1, bias=False)
    x = torch.randn(2, 3, 16, 16)
    ref = conv_t(x).detach().numpy().transpose(0, 2, 3, 1)

    kernel = conv_t.weight.detach().numpy().transpose(2, 3, 1, 0)
    conv_f = fnn.Conv(8, (3, 3), padding="SAME", use_bias=False)
    out = conv_f.apply({"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_depthwise_conv_layout_conversion():
    import flax.linen as fnn

    torch.manual_seed(1)
    C = 8
    conv_t = torch.nn.Conv2d(C, C, 3, stride=1, padding=1, groups=C, bias=False)
    x = torch.randn(2, C, 12, 12)
    ref = conv_t(x).detach().numpy().transpose(0, 2, 3, 1)
    kernel = conv_t.weight.detach().numpy().transpose(2, 3, 1, 0)  # (3,3,1,C)
    conv_f = fnn.Conv(C, (3, 3), padding="SAME", feature_group_count=C, use_bias=False)
    out = conv_f.apply({"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_bert_conversion_matches_hf():
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=48,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(2)
    hf = BertModel(hf_cfg).eval()
    ids = torch.randint(0, 120, (3, 16))
    mask = torch.ones(3, 16, dtype=torch.long)
    mask[1, 10:] = 0
    with torch.no_grad():
        ref = hf(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    sd = {f"text_encoder.text_encoder.{k}": v for k, v in hf.state_dict().items()}
    params = convert_bert(sd, num_heads=4)
    ours_cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=48, dropout_rate=0.0,
    )
    model = BertEncoder(ours_cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()), deterministic=True
    )
    # padded positions differ (HF computes them; values don't matter) — compare valid
    valid = np.asarray(mask.numpy(), bool)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid], atol=2e-4)


def test_bert_fused_qkv_same_params_same_outputs():
    """text_encoder.fused_qkv=True computes Q/K/V as one (H,3H) matmul but
    keeps the DenseGeneral param tree — the SAME params must produce the same
    hidden states through both paths (checkpoints interchange freely)."""
    cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=48, dropout_rate=0.0,
    )
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 120, (3, 16), dtype=np.int32))
    mask = np.ones((3, 16), np.int32)
    mask[1, 10:] = 0
    mask = jnp.asarray(mask)

    import dataclasses

    base = BertEncoder(cfg)
    fused = BertEncoder(dataclasses.replace(cfg, fused_qkv=True))
    params = base.init(jax.random.PRNGKey(0), ids, mask, deterministic=True)["params"]
    # identical trees (leaf names AND shapes) — the interchange contract
    pf = fused.init(jax.random.PRNGKey(0), ids, mask, deterministic=True)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pf)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(pf)):
        assert a.shape == b.shape and a.dtype == b.dtype

    out1 = base.apply({"params": params}, ids, mask, deterministic=True)
    out2 = fused.apply({"params": params}, ids, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_bert_fused_qkv_init_scale_matches_dense_general():
    """A from-scratch fused_qkv init must draw from the SAME distribution as
    nn.DenseGeneral: lecun_normal over the flattened (H, heads*head_dim) kernel
    (fan_in = H). Passing the 3-D shape straight to lecun_normal makes
    fan_in = heads*H (~2x-3.5x too small a std), silently confounding the
    fused-vs-unfused perf A/B with an init-quality change."""
    import dataclasses

    cfg = BertConfig(
        vocab_size=120, hidden_size=256, num_layers=1, num_heads=8,
        intermediate_size=64, max_position_embeddings=16, dropout_rate=0.0,
    )
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    fused = BertEncoder(dataclasses.replace(cfg, fused_qkv=True))
    pf = fused.init(jax.random.PRNGKey(0), ids, mask, deterministic=True)["params"]
    k = np.asarray(pf["layer_0"]["attention"]["query"]["kernel"])
    assert k.shape == (256, 8, 32)
    expected = 1.0 / np.sqrt(256.0)  # lecun_normal, fan_in = hidden_size
    assert abs(k.std() - expected) < 0.15 * expected, (k.std(), expected)


def _fake_efficientnet_state_dict(variant="b0", in_ch=1, prefix="image_encoder."):
    torch.manual_seed(3)
    sd = {}

    def t(*shape):
        return torch.randn(*shape) * 0.05

    stem = stem_filters(variant)
    sd[prefix + "_conv_stem.weight"] = t(stem, in_ch, 3, 3)
    for nm, c in [("_bn0", stem)]:
        sd[prefix + nm + ".weight"] = torch.rand(c) + 0.5
        sd[prefix + nm + ".bias"] = t(c)
        sd[prefix + nm + ".running_mean"] = t(c)
        sd[prefix + nm + ".running_var"] = torch.rand(c) + 0.5
    for i, a in enumerate(scaled_block_args(variant)):
        p = f"{prefix}_blocks.{i}."
        exp = a.in_filters * a.expand_ratio
        if a.expand_ratio != 1:
            sd[p + "_expand_conv.weight"] = t(exp, a.in_filters, 1, 1)
            for nm in ["_bn0"]:
                sd[p + nm + ".weight"] = torch.rand(exp) + 0.5
                sd[p + nm + ".bias"] = t(exp)
                sd[p + nm + ".running_mean"] = t(exp)
                sd[p + nm + ".running_var"] = torch.rand(exp) + 0.5
        sd[p + "_depthwise_conv.weight"] = t(exp, 1, a.kernel, a.kernel)
        sd[p + "_bn1.weight"] = torch.rand(exp) + 0.5
        sd[p + "_bn1.bias"] = t(exp)
        sd[p + "_bn1.running_mean"] = t(exp)
        sd[p + "_bn1.running_var"] = torch.rand(exp) + 0.5
        se = max(1, int(a.in_filters * a.se_ratio))
        sd[p + "_se_reduce.weight"] = t(se, exp, 1, 1)
        sd[p + "_se_reduce.bias"] = t(se)
        sd[p + "_se_expand.weight"] = t(exp, se, 1, 1)
        sd[p + "_se_expand.bias"] = t(exp)
        sd[p + "_project_conv.weight"] = t(a.out_filters, exp, 1, 1)
        sd[p + "_bn2.weight"] = torch.rand(a.out_filters) + 0.5
        sd[p + "_bn2.bias"] = t(a.out_filters)
        sd[p + "_bn2.running_mean"] = t(a.out_filters)
        sd[p + "_bn2.running_var"] = torch.rand(a.out_filters) + 0.5
    head = head_filters(variant)
    last = scaled_block_args(variant)[-1].out_filters
    sd[prefix + "_conv_head.weight"] = t(head, last, 1, 1)
    sd[prefix + "_bn1.weight"] = torch.rand(head) + 0.5
    sd[prefix + "_bn1.bias"] = t(head)
    sd[prefix + "_bn1.running_mean"] = t(head)
    sd[prefix + "_bn1.running_var"] = torch.rand(head) + 0.5
    return sd


def test_efficientnet_state_dict_structure_roundtrip():
    """Converted reference-named EfficientNet tensors load into our model with the
    exact same tree structure as model.init, and the forward runs finite."""
    import chex

    sd = _fake_efficientnet_state_dict("b0")
    params, stats = convert_efficientnet(sd, "image_encoder.")
    model = EfficientNet(variant="b0", in_channels=1)
    x = jnp.zeros((1, 64, 64, 1))
    ref_vars = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    chex.assert_trees_all_equal_shapes({"p": ref_vars["params"]}, {"p": params})
    chex.assert_trees_all_equal_shapes({"s": ref_vars["batch_stats"]}, {"s": stats})
    out = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    assert np.all(np.isfinite(np.asarray(out["pooled"])))


def test_full_clip_state_dict_conversion():
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(4)
    hf = BertModel(hf_cfg)
    sd = _fake_efficientnet_state_dict("b0")
    sd.update({f"text_encoder.text_encoder.{k}": v for k, v in hf.state_dict().items()})
    torch.manual_seed(5)
    sd["image_projection.projection.weight"] = torch.randn(16, 1280) * 0.02
    sd["image_projection.projection.bias"] = torch.zeros(16)
    sd["text_projection.projection.weight"] = torch.randn(16, 32) * 0.02
    sd["text_projection.projection.bias"] = torch.zeros(16)
    sd["logit_scale"] = torch.tensor(2.6593)

    variables = convert_state_dict(sd, num_heads=2)
    model_config = {
        "name": "clip_custom",
        "temperature": 0.07,
        "image_encoder": {"source": "cnn", "name": "efficientnet-b0", "model_type": "cnn"},
        "text_encoder": {
            "source": "bert", "pooling": "eos", "vocab_size": 100, "hidden_size": 32,
            "num_layers": 2, "num_heads": 2, "intermediate_size": 64,
            "max_position_embeddings": 32,
        },
        "projection_head": {"name": "linear", "proj_dim": 16},
    }
    model = MammoCLIP(model_config=model_config)
    batch = {
        "images": jnp.zeros((2, 64, 64, 1)),
        "input_ids": jnp.ones((2, 16), jnp.int32),
        "attention_mask": jnp.ones((2, 16), jnp.int32),
    }
    out = model.apply(variables, batch, train=False)
    assert out["image_embeddings"].shape == (2, 16)
    assert out["text_embeddings"].shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_embeddings"]), axis=1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(float(out["logit_scale"]), np.exp(2.6593), rtol=1e-5)


def test_text_pooling_modes_match_reference_semantics():
    """eos/bos/mean pooling (reference clip.py:62-78) on a crafted hidden state."""
    from mammo_clip_tpu.models.bert import pool_text

    hidden = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3))
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.int32)
    eos = np.asarray(pool_text(hidden, mask, "eos"))
    # last real token: index 2 for row 0, index 1 for row 1
    np.testing.assert_array_equal(eos[0], np.asarray(hidden)[0, 2])
    np.testing.assert_array_equal(eos[1], np.asarray(hidden)[1, 1])
    bos = np.asarray(pool_text(hidden, mask, "bos"))
    np.testing.assert_array_equal(bos, np.asarray(hidden)[:, 0])
    mean = np.asarray(pool_text(hidden, mask, "mean"))
    np.testing.assert_allclose(mean[0], np.asarray(hidden)[0, :3].mean(0), rtol=1e-6)
    np.testing.assert_allclose(mean[1], np.asarray(hidden)[1, :2].mean(0), rtol=1e-6)
    with pytest.raises(NotImplementedError):
        pool_text(hidden, mask, "cls")


def test_export_import_roundtrip(tmp_path):
    """Flax -> reference .tar -> Flax roundtrip is the identity (both directions of
    the interop contract)."""
    import chex

    from mammo_clip_tpu.convert.torch_export import export_clip_checkpoint
    from mammo_clip_tpu.convert.torch_import import convert_clip_checkpoint
    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.models import build_model

    cfg = tiny_test_config()
    model = build_model(cfg.model.to_dict())
    batch = {
        "images": jnp.zeros((1, cfg.data.image_size_h, cfg.data.image_size_w, 1)),
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
    }
    variables = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, train=False))()

    path = str(tmp_path / "export.tar")
    export_clip_checkpoint(variables, path, config=cfg.to_dict(), epoch=3, train_loss=0.5)

    restored, ref_cfg = convert_clip_checkpoint(
        path, num_heads=cfg.model.text_encoder.num_heads
    )
    assert ref_cfg["scheduler"]["epochs"] == cfg.scheduler.epochs
    chex.assert_trees_all_equal_shapes(
        {"p": variables["params"]}, {"p": restored["params"]}
    )
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(variables["batch_stats"]),
                    jax.tree_util.tree_leaves(restored["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_public_checkpoint_shape_end_to_end(tmp_path):
    """Byte-accurate fake of the PUBLIC .tar contract (README.md:363-374): full b2
    state dict at real shapes — 3-channel RGB stem (imagetext.py:121 feeds
    gray->RGB), extra _fc head, HF BERT-base keys, 'module.' DDP prefixes, embedded
    Hydra config — imported via load_clip_for_eval and driven through the zero-shot
    eval path on synthetic images. (Builder shared with the real-data parity
    runner: parity/fake_checkpoint.py.)"""
    from parity.fake_checkpoint import make_fake_public_tar

    path = make_fake_public_tar(str(tmp_path / "b2-model-best-epoch-10.tar"),
                                variant="b2", image_hw=(128, 96),
                                text_max_length=24)

    # ---- the exact consumer path a reference user would take
    from mammo_clip_tpu.data.tokenizer import HashTokenizer
    from mammo_clip_tpu.eval.embeddings import EmbeddingExtractor
    from mammo_clip_tpu.eval.loading import load_clip_for_eval

    model, variables, cfg = load_clip_for_eval(path)
    assert cfg.model.image_encoder.name == "tf_efficientnetv2-detect"
    assert cfg.data.image_size_h == 128 and cfg.data.text_max_length == 24

    ex = EmbeddingExtractor(model, variables, mean=cfg.data.mean, std=cfg.data.std,
                            batch_size=4)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (4, 128, 96, 1), dtype=np.uint8)
    img_emb = ex.encode_images(images)
    tok = HashTokenizer(vocab_size=28996)
    enc = tok(["there is a mass.", "no significant finding."], max_length=24)
    txt_emb = ex.encode_texts(enc["input_ids"], enc["attention_mask"])
    assert img_emb.shape == (4, 512) and txt_emb.shape == (2, 512)
    assert np.all(np.isfinite(img_emb)) and np.all(np.isfinite(txt_emb))
    # embeddings are L2-normalized by the extractor contract
    np.testing.assert_allclose(np.linalg.norm(txt_emb, axis=1), 1.0, atol=1e-4)


def test_hf_vit_conversion_matches_hf():
    """VERDICT r2 #8: pretrained HF ViT weight import (the reference loads HF
    ViTs as alternative image encoders, image_encoder.py:17-48). Numeric parity
    against a randomly-initialized HF ViTModel on replicated-gray input — the
    3->1 channel stem collapse is exact there."""
    from transformers import ViTConfig as HFViTConfig, ViTModel

    from mammo_clip_tpu.convert.torch_import import convert_hf_vit
    from mammo_clip_tpu.models.vit import ViT, ViTConfig

    hf_cfg = HFViTConfig(
        image_size=32, patch_size=8, num_channels=3, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(5)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    gray = torch.rand(2, 1, 32, 32)
    with torch.no_grad():
        ref = hf(pixel_values=gray.repeat(1, 3, 1, 1)).last_hidden_state.numpy()

    params = convert_hf_vit(hf.state_dict(), num_heads=2)
    ours = ViT(cfg=ViTConfig(patch_size=8, hidden_size=32, num_layers=2,
                             num_heads=2, mlp_dim=64, base_grid=4),
               in_channels=1)
    x = jnp.asarray(gray.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = ours.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(out["tokens"]), ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pooled"]), ref[:, 0], atol=2e-4)


def test_hf_swin_conversion_matches_hf():
    """VERDICT r2 #8: pretrained HF Swin weight import (factory
    modules/__init__.py:20-34). Covers shifted windows (stage-0 block 1),
    relative-position bias, and the patch-merging sub-grid permutation."""
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    from mammo_clip_tpu.convert.torch_import import convert_hf_swin
    from mammo_clip_tpu.models.swin import SwinConfig, SwinTransformer

    hf_cfg = HFSwinConfig(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=(2, 2), num_heads=(2, 2), window_size=4, mlp_ratio=4.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(7)
    hf = SwinModel(hf_cfg, add_pooling_layer=True).eval()
    gray = torch.rand(2, 1, 32, 32)
    with torch.no_grad():
        hf_out = hf(pixel_values=gray.repeat(1, 3, 1, 1))
        ref_seq = hf_out.last_hidden_state.numpy()      # (B, 16, 32) post-LN
        ref_pooled = hf_out.pooler_output.numpy()       # (B, 32) mean pool

    params = convert_hf_swin(hf.state_dict(), num_heads=(2, 2))
    ours = SwinTransformer(
        cfg=SwinConfig(patch_size=4, embed_dim=16, depths=(2, 2),
                       num_heads=(2, 2), window=4),
        in_channels=1)
    x = jnp.asarray(gray.numpy().transpose(0, 2, 3, 1))
    out = ours.apply({"params": params}, x, train=False)
    B, H, W, C = out["features"].shape
    np.testing.assert_allclose(
        np.asarray(out["features"]).reshape(B, H * W, C), ref_seq, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pooled"]), ref_pooled, atol=2e-4)


def test_flagship_warm_start_from_compat():
    """ROADMAP r3 #10: the tpu_optimized flagship seeds its deep stages, text
    tower, projections, and logit_scale from a reference-exact checkpoint; the
    s2d front keeps fresh init. method='slab' pins the first-N truncation
    semantics; the importance method has its own tests below."""
    from mammo_clip_tpu.convert.flagship_init import flagship_warm_start
    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.models import build_model

    cfg = tiny_test_config()
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    rng0 = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng0.normal(size=(2, h, w, 1)), jnp.float32),
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }

    compat = build_model(cfg.model.to_dict())
    vc = jax.jit(lambda r: compat.init(r, batch, train=False))(
        {"params": jax.random.PRNGKey(1)})

    cfg.model.image_encoder.tpu_optimized = True
    flag = build_model(cfg.model.to_dict())
    vf = jax.jit(lambda r: flag.init(r, batch, train=False))(
        {"params": jax.random.PRNGKey(2)})

    seeded = flagship_warm_start(
        {"params": vc["params"], "batch_stats": vc["batch_stats"]},
        {"params": vf["params"], "batch_stats": vf["batch_stats"]},
        method="slab")

    # structure matches the flagship exactly
    assert (jax.tree_util.tree_structure(seeded["params"])
            == jax.tree_util.tree_structure(vf["params"]))

    # identical components copied verbatim
    np.testing.assert_array_equal(
        np.asarray(seeded["params"]["logit_scale"]),
        np.asarray(vc["params"]["logit_scale"]))
    np.testing.assert_array_equal(
        np.asarray(seeded["params"]["text_encoder"]["layer_0"]["intermediate"]["kernel"]),
        np.asarray(vc["params"]["text_encoder"]["layer_0"]["intermediate"]["kernel"]))

    # a deep block with remapped width: overlapping slab copied, rest fresh
    enc_c = vc["params"]["image_encoder"]
    enc_f = vf["params"]["image_encoder"]
    enc_s = seeded["params"]["image_encoder"]
    deep = sorted(k for k in enc_s if k.startswith("block_"))[-1]
    assert deep in enc_c, deep
    kc = np.asarray(enc_c[deep]["project_conv"]["kernel"])
    ks = np.asarray(enc_s[deep]["project_conv"]["kernel"])
    kf = np.asarray(enc_f[deep]["project_conv"]["kernel"])
    sl = tuple(slice(0, min(a, b)) for a, b in zip(kc.shape, ks.shape))
    np.testing.assert_array_equal(ks[sl], kc[sl])
    if ks.shape != kc.shape:
        # non-overlapping channels keep the flagship's fresh init
        assert ks.shape == kf.shape

    # the s2d front has no reference analogue -> fresh init preserved
    np.testing.assert_array_equal(
        np.asarray(enc_s["tpu_stem_conv"]["kernel"]),
        np.asarray(enc_f["tpu_stem_conv"]["kernel"]))

    # and the seeded variables actually run through the flagship forward
    out = flag.apply(seeded, batch, train=False)
    assert np.all(np.isfinite(np.asarray(out["image_embeddings"])))


def test_flagship_warm_start_importance_picks_live_channels():
    """Importance-ranked channel selection (convert/flagship_init, ROADMAP r3
    #8): with the FIRST half of a block's expanded channels dead (zero project
    rows), shrinking E by 2x must keep the block's function EXACTLY — the
    dead channels carried nothing — while first-N slab truncation keeps only
    the dead half and destroys the function."""
    import dataclasses

    from mammo_clip_tpu.convert.flagship_init import flagship_warm_start
    from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

    a_src = BlockArgs(kernel=3, stride=1, expand_ratio=4, in_filters=8,
                      out_filters=16, se_ratio=0.0)           # E = 32
    a_dst = dataclasses.replace(a_src, expand_filters=16)     # E = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 8)), jnp.float32)

    src_blk, dst_blk = MBConvBlock(a_src, drop_rate=0.0), MBConvBlock(a_dst, drop_rate=0.0)
    vs = jax.tree_util.tree_map(np.asarray,
                                src_blk.init(jax.random.PRNGKey(1), x, False))
    vd = jax.tree_util.tree_map(np.asarray,
                                dst_blk.init(jax.random.PRNGKey(2), x, False))

    pk = np.array(vs["params"]["project_conv"]["kernel"])  # (1,1,32,16)
    pk[:, :, :16, :] = 0.0                                 # first half: dead
    vs["params"]["project_conv"]["kernel"] = pk

    def as_vars(v):
        return {"params": {"image_encoder": {"block_0": v["params"]}},
                "batch_stats": {"image_encoder": {"block_0": v["batch_stats"]}}}

    out_src = src_blk.apply(
        {"params": vs["params"], "batch_stats": vs["batch_stats"]}, x, False)

    outs = {}
    for method in ("importance", "slab"):
        seeded = flagship_warm_start(as_vars(vs), as_vars(vd), method=method)
        outs[method] = dst_blk.apply(
            {"params": seeded["params"]["image_encoder"]["block_0"],
             "batch_stats": seeded["batch_stats"]["image_encoder"]["block_0"]},
            x, False)

    np.testing.assert_allclose(np.asarray(outs["importance"]),
                               np.asarray(out_src), atol=1e-5)
    assert not np.allclose(np.asarray(outs["slab"]), np.asarray(out_src),
                           atol=1e-3), "slab kept only dead channels yet matched?!"


def test_flagship_warm_start_importance_space_consistency():
    """One selection per tied channel space: on the b0 flagship remap (stage-6
    I/O 192->128 shrinks across a residual chain), the channels kept in block
    i's project output must be EXACTLY the channels kept in block i+1's expand
    input, or the seeded chain is channel-scrambled. Also: every planned
    gather lands the compat leaf on the flagship leaf's shape, and the seeded
    model runs."""
    from mammo_clip_tpu.convert.flagship_init import (_select_indices,
                                                      flagship_warm_start)
    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.models import build_model

    cfg = tiny_test_config()
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    batch = {
        # NOT zeros: an exactly-zero image keeps every bias-free conv at 0 and
        # the final L2 normalize NaNs — a property of any fresh model, nothing
        # to do with the warm start
        "images": jnp.asarray(np.random.default_rng(0).normal(size=(2, h, w, 1)),
                              jnp.float32),
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    compat = build_model(cfg.model.to_dict())
    vc = jax.jit(lambda r: compat.init(r, batch, train=False))(
        {"params": jax.random.PRNGKey(1)})
    cfg.model.image_encoder.tpu_optimized = True
    flag = build_model(cfg.model.to_dict())
    vf = jax.jit(lambda r: flag.init(r, batch, train=False))(
        {"params": jax.random.PRNGKey(2)})

    enc_c = jax.tree_util.tree_map(np.asarray, vc["params"]["image_encoder"])
    sta_c = jax.tree_util.tree_map(np.asarray, vc["batch_stats"]["image_encoder"])
    enc_f = jax.tree_util.tree_map(np.asarray, vf["params"]["image_encoder"])
    plan = _select_indices(enc_c, sta_c, enc_f)
    assert plan, "b0's dense remap shrinks widths; the plan must be non-empty"

    # (1) every planned gather produces exactly the flagship leaf's shape
    def leaf(tree, path):
        node = tree
        for p in path.split("/"):
            if p == "stats":
                return None
            node = node.get(p) if isinstance(node, dict) else None
            if node is None:
                return None
        return node

    checked = 0
    for path, gathers in plan.items():
        src = leaf(enc_c, path)
        dstl = leaf(enc_f, path)
        if src is None or dstl is None:
            continue
        arr = np.asarray(src)
        for ax, idx in gathers:
            assert len(idx) == len(set(idx.tolist())), path
            assert np.all(np.diff(idx) > 0), f"{path}: idx not sorted"
            arr = np.take(arr, idx, axis=ax)
            assert arr.shape[ax] == np.asarray(dstl).shape[ax], (path, ax)
        checked += 1
    assert checked >= 4

    # (2) residual-chain consistency: block i project axis-3 idx == block i+1
    # expand axis-2 idx whenever both are planned for the tied space
    import re as _re

    blocks = sorted((k for k in enc_f if _re.fullmatch(r"block_\d+", k)),
                    key=lambda s: int(s.split("_")[1]))
    pairs = 0
    for b, bn in zip(blocks, blocks[1:]):
        gp = dict(plan.get(f"{b}/project_conv/kernel", []))
        ge = dict(plan.get(f"{bn}/expand_conv/kernel", []))
        if 3 in gp and 2 in ge:
            np.testing.assert_array_equal(gp[3], ge[2])
            pairs += 1
    assert pairs >= 1, "expected at least one shrunk residual chain on b0"

    # (3) the importance-seeded flagship runs end to end
    seeded = flagship_warm_start(
        {"params": vc["params"], "batch_stats": vc["batch_stats"]},
        {"params": vf["params"], "batch_stats": vf["batch_stats"]})
    assert (jax.tree_util.tree_structure(seeded["params"])
            == jax.tree_util.tree_structure(vf["params"]))
    out = flag.apply(seeded, batch, train=False)
    assert np.all(np.isfinite(np.asarray(out["image_embeddings"])))


def test_bert_amp_attn_scores_matches_fp32_path():
    """text_encoder.amp_attn_scores=True stores attention logits/probs in the
    activation dtype (torch-AMP semantics; models/bert.py flag docstring) with
    the softmax math still fp32. Same params, bf16 activations: the two paths
    must agree to bf16 resolution, and the param tree is unchanged."""
    import dataclasses

    cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=48, dropout_rate=0.0,
    )
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, 120, (3, 16), dtype=np.int32))
    mask = np.ones((3, 16), np.int32)
    mask[1, 10:] = 0  # padded keys must stay fully masked through the bf16 path
    mask = jnp.asarray(mask)

    base = BertEncoder(cfg, dtype=jnp.bfloat16)
    amp = BertEncoder(dataclasses.replace(cfg, amp_attn_scores=True), dtype=jnp.bfloat16)
    params = base.init(jax.random.PRNGKey(0), ids, mask, deterministic=True)["params"]
    pa = amp.init(jax.random.PRNGKey(0), ids, mask, deterministic=True)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pa)

    out1 = np.asarray(base.apply({"params": params}, ids, mask, deterministic=True),
                      np.float32)
    out2 = np.asarray(amp.apply({"params": params}, ids, mask, deterministic=True),
                      np.float32)
    # bf16 has ~2-3 decimal digits; layernormed hidden states are O(1)
    np.testing.assert_allclose(out1, out2, atol=0.15)
    assert np.mean(np.abs(out1 - out2)) < 0.02
