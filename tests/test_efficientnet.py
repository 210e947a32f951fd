"""EfficientNet architecture tests: channel math, endpoints, detector taps, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammo_clip_tpu.models.efficientnet import (
    EfficientNet,
    default_detector_taps,
    head_filters,
    round_filters,
    round_repeats,
    scaled_block_args,
    stem_filters,
    tap_channels,
)


def test_round_filters_matches_reference_widths():
    # b2 head 1408, b5 head 2048 (reference: modules/__init__.py:35-46 out_dim table)
    assert round_filters(1280, 1.1) == 1408
    assert round_filters(1280, 1.6) == 2048
    assert round_filters(32, 1.1) == 32
    assert round_filters(32, 1.6) == 48


def test_block_counts():
    assert len(scaled_block_args("b2")) == 23
    assert len(scaled_block_args("b5")) == 39
    assert len(scaled_block_args("b0")) == 16


def test_detector_taps_channels():
    # reference detector FPN sizes: b5 [176,512,2048], b2 [120,352,1408]
    # (detector_model.py:374-391)
    assert default_detector_taps("b5") == (26, 37)
    assert default_detector_taps("b2") == (15, 21)
    assert tap_channels("b5", default_detector_taps("b5")) == [176, 512, 2048]
    assert tap_channels("b2", default_detector_taps("b2")) == [120, 352, 1408]


def test_b0_forward_shapes_and_endpoints():
    model = EfficientNet(variant="b0", in_channels=1, feature_taps=(10, 15))
    x = jnp.zeros((2, 64, 96, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["pooled"].shape == (2, 1280)
    assert out["features"].shape == (2, 2, 3, 1280)
    # reduction_k has spatial scale 1/2^k; reduction_6 is the head output.
    assert out["endpoints"]["reduction_1"].shape[1:3] == (32, 48)
    assert out["endpoints"]["reduction_2"].shape[1:3] == (16, 24)
    assert out["endpoints"]["reduction_3"].shape[1:3] == (8, 12)
    assert out["endpoints"]["reduction_4"].shape[1:3] == (4, 6)
    assert out["endpoints"]["reduction_5"].shape[1:3] == (2, 3)
    assert out["endpoints"]["reduction_6"].shape == (2, 2, 3, 1280)
    assert len(out["taps"]) == 2


def test_odd_input_same_padding():
    """TF SAME padding handles non-multiple-of-32 inputs (e.g. 1520x912 / 16 = 95x57)."""
    model = EfficientNet(variant="b0", in_channels=1)
    x = jnp.zeros((1, 95, 57, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    # ceil division at each of the 5 stride-2 layers: 95 -> 48 -> 24 -> 12 -> 6 -> 3
    assert out["features"].shape[1:3] == (3, 2)


def test_train_mode_updates_batch_stats_and_stochastic_depth():
    model = EfficientNet(variant="b0", in_channels=1, drop_connect_rate=0.2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={"stochastic": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    # running mean must have moved away from init zeros somewhere
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_se_squeeze_uses_input_filters():
    """SE squeeze width must derive from block INPUT filters (lukemelas semantics)."""
    model = EfficientNet(variant="b0", in_channels=1)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = variables["params"]
    # block_1 (stage 2 first block): in=16, expand=6 -> expanded 96, squeeze = int(16*0.25)=4
    se_reduce = params["block_1"]["se"]["reduce"]["kernel"]
    assert se_reduce.shape == (1, 1, 96, 4)


def test_packed_residuals_identical():
    """packed_residuals is a pure layout change: forward bit-identical, gradients
    within reassociation noise, param tree unchanged (checkpoint-compatible)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 48, 1)), jnp.float32)
    kw = dict(variant="b0", in_channels=1, remat=True, remat_max_reduction=32)
    m1 = EfficientNet(**kw, packed_residuals=False)
    m2 = EfficientNet(**kw, packed_residuals=True)
    v = jax.jit(lambda x: m1.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    # identical param tree: the packed variant initializes to the same structure
    v2 = jax.jit(lambda x: m2.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    out1 = jax.jit(lambda v, x: m1.apply(v, x, False))(v, x)
    out2 = jax.jit(lambda v, x: m2.apply(v, x, False))(v, x)
    np.testing.assert_array_equal(np.asarray(out1["pooled"]), np.asarray(out2["pooled"]))
    for k in out1["endpoints"]:
        assert out1["endpoints"][k].shape == out2["endpoints"][k].shape

    def loss(v, x, m):
        out, mut = m.apply(v, x, True, rngs={"stochastic": jax.random.PRNGKey(3)},
                           mutable=["batch_stats"])
        return jnp.sum(out["pooled"].astype(jnp.float32) ** 2), mut

    (l1, _), g1 = jax.jit(jax.value_and_grad(loss, has_aux=True), static_argnums=2)(v, x, m1)
    (l2, _), g2 = jax.jit(jax.value_and_grad(loss, has_aux=True), static_argnums=2)(v, x, m2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    f1 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g1)])
    f2 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g2)])
    rel = float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1))
    assert rel < 1e-5, rel  # measured 8.6e-7; remat-on-vs-off fusion noise is 3.8e-5


def test_tpu_optimized_variant_trains():
    """The space-to-depth variant: dense-lane front end, same output contract,
    gradients flow everywhere (trains-from-scratch variant, not ckpt-compatible)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mammo_clip_tpu.models.efficientnet import EfficientNet, head_filters

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 48, 1)), jnp.float32)
    m = EfficientNet(variant="b0", in_channels=1, tpu_optimized=True)
    v = jax.jit(lambda x: m.init({"params": jax.random.PRNGKey(0)}, x, False))(x)
    assert "tpu_stem_conv" in v["params"] and "tpu_front_block_0" in v["params"]
    assert "stem_conv" not in v["params"]
    # shallow blocks replaced: the first surviving block starts at 1/4 scale
    assert "block_0" not in v["params"] and "block_1" not in v["params"]

    out = jax.jit(lambda v, x: m.apply(v, x, False))(v, x)
    assert out["pooled"].shape == (2, head_filters("b0"))
    assert out["features"].shape[1:3] == (2, 2)  # 64/32, 48/32 (1/32 scale kept)

    def loss(v, x):
        o, mut = m.apply(v, x, True, rngs={"stochastic": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
        return jnp.sum(o["pooled"].astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(v, x)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_tpu_dense_widths_remap():
    """tpu_dense_widths: every deep-stage tensor width in the flagship is a
    128-multiple — I/O widths snap to the NEAREST multiple (B5: 64->128,
    176->128, 304->256), expanded widths snap to the nearest multiple (1056->1024, 1824->1792) so
    capacity survives the rounding (VERDICT r2 #2: no lane pads left)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.efficientnet import EfficientNet, scaled_block_args

    # reproduce the module's remap via its param tree: build flagship b5
    # abstractly and check every conv kernel's channel dims are 128-multiples
    m = EfficientNet(variant="b5", in_channels=1, tpu_optimized=True)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))

    def walk(tree, path=""):
        for k, sub in tree.items():
            p = f"{path}/{k}"
            if hasattr(sub, "items"):
                yield from walk(sub, p)
            else:
                yield p, sub

    for path, leaf in walk(v["params"]):
        if "block_" not in path or "/se/" in path:
            continue  # SE squeeze widths are intentionally narrow (gates, tiny)
        if path.endswith("/kernel") and len(leaf.shape) == 4:
            kh, kw, cin, cout = leaf.shape
            if cin > 1:  # depthwise kernels carry in_per_group=1
                assert cin % 128 == 0, (path, leaf.shape)
            assert cout % 128 == 0, (path, leaf.shape)

    # r2 recipe reproducible: dense widths off keeps the original deep widths
    m_r2 = EfficientNet(variant="b5", in_channels=1, tpu_optimized=True,
                        tpu_dense_widths=False)
    v_r2 = jax.eval_shape(lambda: m_r2.init({"params": jax.random.PRNGKey(0)}, x, False))
    widths = {leaf.shape[-1] for p, leaf in walk(v_r2["params"])
              if "block_" in p and p.endswith("project_conv/kernel")}
    assert 176 in widths and 304 in widths


def test_tpu_slim_stage3_override():
    """tpu_slim_stage3=E overrides the expanded width of exactly the E=384 k5
    stage (B5 stage3, blocks 9-12; the entry block 8 is already E=256 via its
    expand_ratio=2 remap) and leaves every other stage untouched — the
    capacity-cut probe behind ROADMAP #2."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.zeros((1, 64, 64, 1), jnp.float32)

    def expand_widths(m):
        v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))
        out = {}
        for name, sub in v["params"].items():
            if name.startswith("block_") and "expand_conv" in sub:
                out[name] = sub["expand_conv"]["kernel"].shape[-1]
        return out

    base = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True))
    slim = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True,
                                      tpu_slim_stage3=256))
    assert base != slim
    changed = {k for k in base if base[k] != slim[k]}
    assert changed == {f"block_{i}" for i in (9, 10, 11, 12)}, changed
    for k in changed:
        assert base[k] == 384 and slim[k] == 256, (k, base[k], slim[k])


def test_tpu_slim_stage5_override():
    """tpu_slim_stage5=E overrides the expanded width of exactly the k5 blocks
    at E=1024 (B5 stage5 in-stage blocks 21-26 plus the stage6 entry block 27,
    which expands at the same 1/16 resolution; stage5's entry block 20 is
    E=768 and stays) — the second capacity-cut probe (ROADMAP r3 #3)."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.zeros((1, 64, 64, 1), jnp.float32)

    def expand_widths(m):
        v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))
        out = {}
        for name, sub in v["params"].items():
            if name.startswith("block_") and "expand_conv" in sub:
                out[name] = sub["expand_conv"]["kernel"].shape[-1]
        return out

    base = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True))
    slim = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True,
                                      tpu_slim_stage5=768))
    changed = {k for k in base if base[k] != slim[k]}
    assert changed == {f"block_{i}" for i in range(21, 28)}, changed
    for k in changed:
        assert base[k] == 1024 and slim[k] == 768, (k, base[k], slim[k])

    # both slim probes compose
    both = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True,
                                      tpu_slim_stage3=256, tpu_slim_stage5=768))
    changed2 = {k for k in base if base[k] != both[k]}
    assert changed2 == {f"block_{i}" for i in (9, 10, 11, 12)} | {f"block_{i}" for i in range(21, 28)}

def test_tpu_slim_stage6_override():
    """tpu_slim_stage6=E overrides the expanded width of exactly the k5 blocks
    at E=1792 (B5 stage6 in-stage blocks 28-35; the stage7 entry block 36
    expands at the same width but is k3 and must stay) — the r4 capacity-cut
    candidate (BASELINE.md r3-final profile)."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.zeros((1, 64, 64, 1), jnp.float32)

    def expand_widths(m):
        v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))
        out = {}
        for name, sub in v["params"].items():
            if name.startswith("block_") and "expand_conv" in sub:
                out[name] = sub["expand_conv"]["kernel"].shape[-1]
        return out

    base = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True))
    slim = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True,
                                      tpu_slim_stage6=1536))
    changed = {k for k in base if base[k] != slim[k]}
    assert changed == {f"block_{i}" for i in range(28, 36)}, changed
    for k in changed:
        assert base[k] == 1792 and slim[k] == 1536, (k, base[k], slim[k])
    assert base["block_36"] == slim["block_36"]  # k3 stage7 entry untouched


def test_tpu_slim_stage4_override():
    """tpu_slim_stage4=E overrides the expanded width of exactly the k3 blocks
    at E=768 (B5 stage4 in-stage blocks 14-19; the k5 stage5 entry block 20
    expands at the same 768 and must stay; the stage4 entry block 13 expands
    at 384 and must stay)."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.efficientnet import EfficientNet

    x = jnp.zeros((1, 64, 64, 1), jnp.float32)

    def expand_widths(m):
        v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))
        out = {}
        for name, sub in v["params"].items():
            if name.startswith("block_") and "expand_conv" in sub:
                out[name] = sub["expand_conv"]["kernel"].shape[-1]
        return out

    base = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True))
    slim = expand_widths(EfficientNet(variant="b5", in_channels=1, tpu_optimized=True,
                                      tpu_slim_stage4=512))
    changed = {k for k in base if base[k] != slim[k]}
    assert changed == {f"block_{i}" for i in range(14, 20)}, changed
    for k in changed:
        assert base[k] == 768 and slim[k] == 512, (k, base[k], slim[k])
    assert base["block_20"] == slim["block_20"]  # k5 stage5 entry untouched
    assert base["block_13"] == slim["block_13"]  # stage4 entry (E384) untouched


def test_slim_flags_reach_factory():
    """Every tpu_slim_stageN flag must survive the config-dict -> factory path
    (models/clip.py load_image_encoder), not just direct EfficientNet
    construction — tpu_slim_stage6 was silently dropped there once (r3)."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.models.clip import load_image_encoder

    x = jnp.zeros((1, 64, 64, 1), jnp.float32)

    def expand_widths(cfg):
        m = load_image_encoder(cfg)
        v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))
        out = {}
        for name, sub in v["params"].items():
            if name.startswith("block_") and "expand_conv" in sub:
                out[name] = sub["expand_conv"]["kernel"].shape[-1]
        return out

    base_cfg = {"name": "tf_efficientnet_b5_ns", "in_channels": 1, "tpu_optimized": True}
    base = expand_widths(base_cfg)
    for flag, E, blocks in [
        ("tpu_slim_stage3", 256, range(9, 13)),
        ("tpu_slim_stage4", 512, range(14, 20)),
        ("tpu_slim_stage5", 768, range(21, 28)),
        ("tpu_slim_stage6", 1536, range(28, 36)),
        ("tpu_slim_stage7", 2560, range(37, 39)),
    ]:
        slim = expand_widths({**base_cfg, flag: E})
        changed = {k for k in base if base[k] != slim[k]}
        assert changed == {f"block_{i}" for i in blocks}, (flag, changed)
        assert all(slim[k] == E for k in changed), flag


def test_every_encoder_field_reaches_factory():
    """Generalized guard for the r3 silent-drop bug class: every scalar config
    field on EfficientNet must survive the config-dict -> load_image_encoder
    path. Constructs a config with a distinctive value per field and checks
    the built module carries it."""
    import dataclasses

    from mammo_clip_tpu.models.clip import load_image_encoder
    from mammo_clip_tpu.models.efficientnet import EfficientNet

    skip = {"parent", "name", "dtype", "variant"}  # construction-level knobs
    probe_value = {bool: True, int: 13, str: "gem", float: 0.125}
    base = {"name": "tf_efficientnet_b5_ns"}
    for f in dataclasses.fields(EfficientNet):
        if f.name in skip:
            continue
        default = f.default
        if type(default) not in probe_value:
            if f.name == "feature_taps":
                got = load_image_encoder({**base, "feature_taps": [3, 5]})
                assert got.feature_taps == (3, 5), "feature_taps dropped"
                continue
            raise AssertionError(f"unhandled field type for {f.name}: add a probe")
        val = probe_value[type(default)]
        if val == default:  # need a value that differs from the default
            val = False if isinstance(default, bool) else (default + 1 if isinstance(default, int) else "avg")
        got = load_image_encoder({**base, f.name: val})
        assert getattr(got, f.name) == val, (
            f"EfficientNet.{f.name} silently dropped by load_image_encoder")
