"""Downstream classification/detection driver tests + Mammo-FActOR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mammo_clip_tpu.downstream.classify import (
    MammoClassifier,
    MammoEfficientNetClassifier,
    POS_WEIGHTS,
    aggregate_rsna_predictions,
    classifier_from_clip_checkpoint,
)
from mammo_clip_tpu.downstream.experiments import (
    make_classifier_steps,
    make_detector_steps,
    train_classifier,
)
from mammo_clip_tpu.interpret.factor import FactorMapper, factor_loss
from mammo_clip_tpu.models.retinanet import RetinaNet, anchors_for
from mammo_clip_tpu.ops.augment import AugmentConfig
from mammo_clip_tpu.train.state import TrainState
from mammo_clip_tpu.train.optim import build_optimizer


def _separable_batches(n, h=32, w=32, seed=0):
    """Synthetic binary task: positives have a bright square."""
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 60, (n, h, w, 1)).astype(np.uint8)
    labels = rng.integers(0, 2, n).astype(np.float32)
    for i in range(n):
        if labels[i]:
            images[i, 8:20, 8:20] += 150
    return images, labels


def test_linear_probe_learns_separable_task(tmp_path):
    h = w = 32
    model = MammoClassifier(
        image_encoder_config={"name": "efficientnet-b0", "in_channels": 1},
        num_classes=1,
        freeze_encoder=False,
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 1)), train=False)
    )()

    imgs, labels = _separable_batches(32)
    v_imgs, v_labels = _separable_batches(16, seed=1)

    def train_batches(epoch):
        for i in range(0, 32, 8):
            yield {"images": jnp.asarray(imgs[i : i + 8]), "labels": jnp.asarray(labels[i : i + 8])}

    def valid_batches():
        for i in range(0, 16, 8):
            yield {"images": jnp.asarray(v_imgs[i : i + 8]), "labels": jnp.asarray(v_labels[i : i + 8])}

    # augmentation correctness is covered by tests/test_{warp,augment}.py; train with
    # the no-op pipeline here so the driver test isn't sensitive to aug randomness
    aug = AugmentConfig(hflip_p=0.0, vflip_p=0.0, affine_p=0.0, elastic_p=0.0)
    res = train_classifier(
        model,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        train_batches,
        valid_batches,
        epochs=8,
        steps_per_epoch=4,
        lr=3e-3,
        loss_kind="bce",
        aug=aug,
        workdir=str(tmp_path),
        config={"kind": "test"},
    )
    assert res["best_metric"] > 0.8, res


def test_classifier_from_clip_checkpoint_and_freeze():
    clip_cfg = {"model": {"image_encoder": {"name": "efficientnet-b0", "in_channels": 1}}}
    # fake CLIP variables with the right structure
    from mammo_clip_tpu.models.efficientnet import EfficientNet

    enc = EfficientNet(variant="b0", in_channels=1)
    enc_vars = jax.jit(
        lambda: enc.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 32, 32, 1)), train=False)
    )()
    clip_vars = {
        "params": {"image_encoder": enc_vars["params"]},
        "batch_stats": {"image_encoder": enc_vars["batch_stats"]},
    }
    model, variables = classifier_from_clip_checkpoint(
        clip_cfg, clip_vars, num_classes=1, freeze_encoder=True, example_shape=(1, 32, 32, 1)
    )
    # encoder weights taken verbatim from the CLIP tree
    a = jax.tree_util.tree_leaves(variables["params"]["image_encoder"])
    b = jax.tree_util.tree_leaves(clip_vars["params"]["image_encoder"])
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    # frozen encoder -> zero encoder grads
    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.ones((2, 32, 32, 1)),
            train=True,
        )
        return jnp.mean(out["logits"] ** 2)

    grads = jax.grad(loss)(variables["params"])
    enc_grad = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["image_encoder"]))
    head_grad = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["head"]))
    assert enc_grad == 0.0 and head_grad > 0.0


def test_rsna_aggregation():
    import pandas as pd

    df = pd.DataFrame(
        {
            "patient_id": ["a", "a", "b"],
            "laterality": ["L", "L", "R"],
            "pred": [0.2, 0.4, 0.9],
            "cancer": [0, 0, 1],
        }
    )
    agg = aggregate_rsna_predictions(df)
    assert len(agg) == 2
    np.testing.assert_allclose(agg[agg.patient_id == "a"].pred.iloc[0], 0.3)


def test_pos_weight_table():
    # reference train_classifier.py:113-141
    assert abs(POS_WEIGHTS["vindr/Mass"] - 15.573306) < 1e-5
    assert abs(POS_WEIGHTS["rsna/cancer"] - 46.5) < 1.0


def test_detector_train_step_decreases_loss():
    H = W = 64
    model = RetinaNet(
        image_encoder_config={"name": "efficientnet-b0", "in_channels": 1},
        num_classes=2,
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 1)), train=False)
    )()
    anchors = anchors_for((H, W))
    sched = lambda step: 1e-4
    tx = build_optimizer({"name": "adam", "lr": 1e-4, "grad_clip_norm": 0.1}, sched)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    preprocess = lambda b, rng: b
    train_step, infer_step, _ = make_detector_steps(model, anchors, preprocess)
    rng_np = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng_np.standard_normal((2, H, W, 1)).astype(np.float32)),
        "annotations": jnp.asarray(
            [[[4, 4, 24, 24, 0], [-1, -1, -1, -1, -1]],
             [[30, 30, 60, 60, 1], [8, 40, 28, 60, 0]]],
            jnp.float32,
        ),
    }
    losses = []
    for _ in range(6):
        state, ld = train_step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(ld["total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    out = infer_step(state, batch)
    assert out["class_probs"].shape[0] == 2


def test_factor_mapper_and_loss():
    B, H, W, C = 2, 4, 4, 8
    A, L = 3, 16
    mapper = FactorMapper(num_attributes=A, lang_dim=L, spatial_dim=H * W)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, W, C)), jnp.float32)
    variables = mapper.init(jax.random.PRNGKey(0), feats)
    region_embs = mapper.apply(variables, feats)
    assert region_embs.shape == (B, C, A, L)

    attr_embs = np.random.default_rng(1).standard_normal((A, L)).astype(np.float32)
    attr_embs /= np.linalg.norm(attr_embs, axis=1, keepdims=True)
    labels = jnp.asarray([[1, 0, 0], [0, 1, 0]], jnp.float32)
    loss = factor_loss(region_embs, jnp.asarray(attr_embs), labels)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # training the mapper on a fixed target decreases the loss
    def loss_fn(params):
        emb = mapper.apply({"params": params}, feats)
        return factor_loss(emb, jnp.asarray(attr_embs), labels)

    import optax

    tx = optax.adam(1e-2)
    params = variables["params"]
    opt_state = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(10):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < l0


def test_factor_loss_grads_finite_at_zero_regions():
    """Regression (r3, found by the factor-CLI driver test): the mapper emits
    EXACTLY-zero region rows at init when the frozen features are tiny (relu(0)
    -> zero fc2 bias), and jnp.linalg.norm's gradient is NaN at zero — the safe
    normalize in factor_loss must keep the backward finite."""
    A, L = 2, 8
    attr = np.random.default_rng(0).standard_normal((A, L)).astype(np.float32)
    attr /= np.linalg.norm(attr, axis=1, keepdims=True)
    labels = jnp.asarray(np.eye(A, dtype=np.float32))

    def loss_of(emb):
        return factor_loss(emb, jnp.asarray(attr), labels)

    emb = np.random.default_rng(1).standard_normal((A, 4, A, L)).astype(np.float32)
    emb[0, 2] = 0.0  # one all-zero region row
    emb[1] = 0.0  # one image with EVERY region zero
    val, grads = jax.value_and_grad(loss_of)(jnp.asarray(emb))
    assert np.isfinite(float(val))
    assert bool(jnp.isfinite(grads).all()), "NaN grads at zero region rows"


def test_classifier_resume_and_predictions_artifact(tmp_path):
    """VERDICT r2 #7: train_classifier persists the validation predictions in
    the best checkpoint (offline re-scoring parity with the reference's
    Classifiers/experiments.py:193-222) and resumes mid-run from
    workdir/checkpoints preserving the best-metric watermark."""
    from mammo_clip_tpu.train.checkpoint import load_checkpoint_arrays

    h = w = 32
    model = MammoClassifier(
        image_encoder_config={"name": "efficientnet-b0", "in_channels": 1},
        num_classes=1, freeze_encoder=False,
    )
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, h, w, 1)), train=False))()
    imgs, labels = _separable_batches(16)
    v_imgs, v_labels = _separable_batches(16, seed=1)

    def train_batches(epoch):
        yield {"images": jnp.asarray(imgs[:8]), "labels": jnp.asarray(labels[:8])}

    def valid_batches():
        for i in range(0, 16, 8):
            yield {"images": jnp.asarray(v_imgs[i:i + 8]),
                   "labels": jnp.asarray(v_labels[i:i + 8])}

    aug = AugmentConfig(hflip_p=0.0, vflip_p=0.0, affine_p=0.0, elastic_p=0.0)
    kw = dict(epochs=2, steps_per_epoch=1, lr=1e-3, loss_kind="bce", aug=aug,
              workdir=str(tmp_path), config={"kind": "test"})
    res1 = train_classifier(
        model, {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        train_batches, valid_batches, **kw)

    # predictions artifact rides the best checkpoint
    arrays = load_checkpoint_arrays(str(tmp_path / "best"))
    assert set(arrays) >= {"predictions", "labels"}
    assert arrays["predictions"].shape == arrays["labels"].shape == (16,)
    from mammo_clip_tpu.eval.metrics import auroc
    # re-scoring the persisted predictions reproduces a recorded metric
    assert any(abs(auroc(arrays["labels"], arrays["predictions"]) - m) < 1e-9
               for m in res1["history"])

    # resume: same workdir, more epochs — starts at epoch 2, keeps best
    res2 = train_classifier(
        model, {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        train_batches, valid_batches, resume=True,
        **{**kw, "epochs": 3})
    assert len(res2["history"]) == len(res1["history"]) + 1
    assert res2["best_metric"] >= res1["best_metric"] - 1e-9


def test_flagship_checkpoint_backs_downstream_models():
    """r3: the downstream models build their encoder through the SHARED factory,
    so a tpu_optimized (flagship) checkpoint config produces a matching encoder
    in the classifier AND the detector (taps live in deep blocks that survive
    the front-end replacement; widths follow the dense remap)."""
    from mammo_clip_tpu.models.retinanet import RetinaNet, anchors_for
    from mammo_clip_tpu.losses.focal import focal_loss

    ie = {"name": "efficientnet-b0", "in_channels": 1, "tpu_optimized": True}
    h = w = 64

    clf = MammoClassifier(image_encoder_config=ie, num_classes=1,
                          freeze_encoder=False)
    v = jax.jit(lambda: clf.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, h, w, 1)), train=False))()
    assert "tpu_front_block_0" in v["params"]["image_encoder"], (
        "classifier encoder ignored tpu_optimized")
    out = clf.apply(v, jnp.ones((2, h, w, 1)), train=False)
    assert out["logits"].shape == (2, 1)

    det = RetinaNet(image_encoder_config=ie, num_classes=3)
    vd = jax.jit(lambda: det.init({"params": jax.random.PRNGKey(0)},
                                  jnp.zeros((1, h, w, 1)), train=False))()
    assert "tpu_front_block_0" in vd["params"]["image_encoder"]
    o = det.apply(vd, jnp.ones((2, h, w, 1)), train=False)
    anchors = anchors_for((h, w))
    assert o["class_probs"].shape[1] == anchors.shape[0]
    # gradients flow through the flagship backbone into the focal loss
    ann = jnp.asarray(np.broadcast_to(
        np.asarray([[4.0, 4.0, 20.0, 20.0, 0.0]], np.float32), (2, 1, 5)))

    def loss(params):
        o = det.apply({"params": params, "batch_stats": vd["batch_stats"]},
                      jnp.ones((2, h, w, 1)), train=False)
        return focal_loss(o["class_probs"], o["box_deltas"],
                          jnp.asarray(anchors), ann)["total"]

    g = jax.grad(loss)(vd["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_rescore_cli_reads_predictions_artifact(tmp_path):
    """cli/rescore recomputes metrics from the persisted predictions sidecar
    alone (reference offline re-scoring, Classifiers/experiments.py:193-222)."""
    import json as _json

    from mammo_clip_tpu.cli import rescore
    from mammo_clip_tpu.train.checkpoint import save_checkpoint
    from mammo_clip_tpu.train.state import TrainState
    import optax

    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros(2)}
    state = TrainState(step=jnp.asarray(1, jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    rng = np.random.default_rng(0)
    labels = (np.arange(20) % 2).astype(np.float32)
    preds = labels * 0.8 + rng.uniform(0, 0.2, 20)
    save_checkpoint(str(tmp_path / "best"), state, max_to_keep=1,
                    extra_arrays={"predictions": preds, "labels": labels})
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rescore.main(["--checkpoint", str(tmp_path / "best")])
    out = _json.loads(buf.getvalue().strip())
    assert out["n"] == 20 and out["auroc"] > 0.99 and out["accuracy"] > 0.9


def test_rescore_cli_handles_multiclass_artifact(tmp_path):
    """Multi-class prediction artifacts (the classifier CLI's ce labels —
    density/birads — persist (N, C) probabilities) must rescore without
    crashing: default metrics become macro one-vs-rest auroc + accuracy, and
    an explicit pfbeta request fails loudly (binary-only metric)."""
    import json as _json

    import optax
    import pytest

    from mammo_clip_tpu.cli import rescore
    from mammo_clip_tpu.train.checkpoint import save_checkpoint
    from mammo_clip_tpu.train.state import TrainState

    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros(2)}
    state = TrainState(step=jnp.asarray(1, jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    rng = np.random.default_rng(0)
    labels = (np.arange(30) % 3).astype(np.float32)
    preds = rng.uniform(0, 0.2, (30, 3))
    preds[np.arange(30), labels.astype(int)] += 0.8  # near-perfect classifier
    save_checkpoint(str(tmp_path / "best"), state, max_to_keep=1,
                    extra_arrays={"predictions": preds, "labels": labels})
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rescore.main(["--checkpoint", str(tmp_path / "best")])
    out = _json.loads(buf.getvalue().strip())
    assert out["n"] == 30 and out["auroc"] > 0.99 and out["accuracy"] > 0.95
    assert "pfbeta" not in out  # binary-only; excluded from the default set
    with pytest.raises(SystemExit):
        rescore.main(["--checkpoint", str(tmp_path / "best"), "--metric", "pfbeta"])
