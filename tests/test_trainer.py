"""End-to-end trainer test on synthetic data (tiny config, CPU mesh) — the rebuild's
answer to the reference's '--running-interactive' sanity mode (SURVEY.md §4)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from mammo_clip_tpu.core.config import tiny_test_config
from mammo_clip_tpu.core.mesh import MeshContext
from mammo_clip_tpu.data.datasets import ImageTextDataset
from mammo_clip_tpu.data.images import SyntheticImageStore
from mammo_clip_tpu.data.pipeline import Batcher, prefetch_to_device
from mammo_clip_tpu.data.tokenizer import HashTokenizer
from mammo_clip_tpu.train.trainer import Trainer, make_clip_preprocess


def _synthetic_df(n=16):
    rows = []
    for i in range(n):
        rows.append(
            {
                "patient_id": f"p{i}",
                "laterality": "R" if i % 2 else "L",
                "image": [f"i{i}_a.png", f"i{i}_b.png"],
                "view": ["CC", "MLO"],
                "CC": [f"i{i}_a.png"],
                "MLO": [f"i{i}_b.png"],
                "text": [f"there is a mass in sample {i}.", f"impression {i} is benign."],
                "text_augment": [f"a mass exists in sample {i}.", f"sample {i} looks benign."],
                "fold": i % 4,
            }
        )
    return pd.DataFrame(rows)


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=2, warmup_epochs=1)
    cfg.train.update(log_every=2, profile_at_step=1, profile_num_steps=2)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w

    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_ds = ImageTextDataset(_synthetic_df(16), store, split="train")
    valid_ds = ImageTextDataset(_synthetic_df(8), store, split="valid")
    train_b = Batcher(train_ds, tok, batch_size=8, max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    valid_b = Batcher(valid_ds, tok, batch_size=8, max_length=cfg.data.text_max_length,
                      shuffle=False, process_index=0, process_count=1)

    ctx = MeshContext.create(data=8, model=1)

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(iter(train_b), ctx)

    def valid_batches(epoch):
        return prefetch_to_device(iter(valid_b), ctx)

    workdir = str(tmp_path / "run")
    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=workdir)
    state = trainer.fit(train_batches, valid_batches, steps_per_epoch=len(train_b))

    assert int(state.step) == 2 * len(train_b)
    # checkpoints written with embedded config
    assert os.path.isdir(os.path.join(workdir, "checkpoints"))
    assert os.path.isdir(os.path.join(workdir, "best"))
    # metrics jsonl exists with train + valid rows
    lines = [json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))]
    prefixes = {l["prefix"] for l in lines}
    assert {"train", "valid"} <= prefixes
    losses = [l for l in lines if l["prefix"] == "train"]
    assert all(np.isfinite(l["loss/total"]) for l in losses)
    # LR observability (reference logs LR scalars every 30 steps): finite,
    # positive, and following the warmup-cos^2 shape (first logged < peak)
    lrs = [l["perf/lr"] for l in losses]
    assert all(np.isfinite(v) and v > 0 for v in lrs)
    # profiler window (train.profile_at_step): a trace landed in workdir/profile
    prof_dir = os.path.join(workdir, "profile")
    assert os.path.isdir(prof_dir) and any(
        f for _, _, fs in os.walk(prof_dir) for f in fs)

    # resume path: new trainer picks up from the checkpoint without error
    trainer2 = Trainer(cfg, mesh_ctx=ctx, workdir=workdir)
    state2 = trainer2.fit(train_batches, valid_batches, steps_per_epoch=len(train_b), resume=True)
    assert int(state2.step) == int(state.step)  # already at final epoch


def test_preprocess_eval_mode_normalizes_only():
    cfg = tiny_test_config()
    pp = make_clip_preprocess(cfg)
    import jax.numpy as jnp

    batch = {"images": jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 16, 16, 1), dtype=np.uint8))}
    out1 = pp(dict(batch), None)
    out2 = pp(dict(batch), None)
    np.testing.assert_array_equal(np.asarray(out1["images"]), np.asarray(out2["images"]))
    assert out1["images"].dtype == jnp.float32


@pytest.mark.slow
def test_resume_preserves_best_val(tmp_path):
    """Regression: resume must NOT reset best_val to inf — the first post-resume
    epoch used to overwrite best/ even when worse than the pre-preemption best."""
    import glob

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.train.update(log_every=100)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w

    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_b = Batcher(ImageTextDataset(_synthetic_df(8), store, split="train"), tok,
                      batch_size=8, max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    valid_b = Batcher(ImageTextDataset(_synthetic_df(8), store, split="valid"), tok,
                      batch_size=8, max_length=cfg.data.text_max_length,
                      shuffle=False, process_index=0, process_count=1)
    ctx = MeshContext.create(data=8, model=1)

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(iter(train_b), ctx)

    def valid_batches(epoch):
        return prefetch_to_device(iter(valid_b), ctx)

    workdir = str(tmp_path / "run")
    Trainer(cfg, mesh_ctx=ctx, workdir=workdir).fit(
        train_batches, valid_batches, steps_per_epoch=len(train_b))

    metas = sorted(glob.glob(os.path.join(workdir, "checkpoints", "*", "meta.json")))
    assert metas, "no checkpoint meta written"
    meta = json.load(open(metas[-1]))
    assert meta.get("best_val") is not None  # persisted

    # pretend the pre-preemption best was unbeatably good
    meta["best_val"] = -1e9
    json.dump(meta, open(metas[-1], "w"))
    best_meta_before = json.load(open(glob.glob(os.path.join(workdir, "best", "*", "meta.json"))[0]))

    cfg.scheduler.update(epochs=2)  # one more epoch after resume
    Trainer(cfg, mesh_ctx=ctx, workdir=workdir).fit(
        train_batches, valid_batches, steps_per_epoch=len(train_b), resume=True)

    best_meta_after = json.load(open(glob.glob(os.path.join(workdir, "best", "*", "meta.json"))[0]))
    assert best_meta_after["epoch"] == best_meta_before["epoch"], (
        "resume overwrote best/ despite a better recorded best_val")


def test_reseed_preserves_base_seed():
    """Regression: reseed(epoch) used to set self.seed = epoch, making every run
    sample identically from epoch 1 onward regardless of its constructor seed."""
    df = _synthetic_df(8)
    store = SyntheticImageStore((16, 16))
    ds_a = ImageTextDataset(df, store, split="train", seed=0)
    ds_b = ImageTextDataset(df, store, split="train", seed=1)

    def texts(ds):
        return [ds[i]["text"] for i in range(len(ds))]

    ds_a.reseed(1)
    ds_b.reseed(1)
    assert texts(ds_a) != texts(ds_b), "different base seeds must sample differently at epoch 1"

    before = texts(ds_a)
    ds_a.reseed(2)
    assert texts(ds_a) != before, "epochs must sample differently"


@pytest.mark.slow
def test_trainer_flagship_warm_start(tmp_path):
    """Trainer.fit(warm_start_from=...) seeds a tpu_optimized run from a
    reference-exact checkpoint (cli/pretrain --warm-start-from)."""
    import jax

    from mammo_clip_tpu.train.checkpoint import save_checkpoint
    from mammo_clip_tpu.train.optim import build_optimizer
    from mammo_clip_tpu.train.state import create_train_state
    from mammo_clip_tpu.models import build_model

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w

    # a compat "checkpoint" with a recognizable logit_scale
    import jax.numpy as jnp

    compat = build_model(cfg.model.to_dict())
    ex = {"images": jnp.zeros((2, h, w, 1), jnp.float32),
          "input_ids": jnp.ones((2, 8), jnp.int32),
          "attention_mask": jnp.ones((2, 8), jnp.int32)}
    tx = build_optimizer({"name": "adamw", "lr": 1e-3, "weight_decay": 0.0},
                         lambda s: 1e-3)
    cstate = create_train_state(compat, ex, tx, jax.random.PRNGKey(0))
    cstate = cstate.replace(params={**cstate.params,
                                    "logit_scale": jnp.asarray(1.2345, jnp.float32)})
    ckpt = str(tmp_path / "compat_best")
    save_checkpoint(ckpt, cstate, config=cfg.to_dict(), max_to_keep=1)

    cfg.model.image_encoder.tpu_optimized = True
    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_ds = ImageTextDataset(_synthetic_df(16), store, split="train")
    train_b = Batcher(train_ds, tok, batch_size=8,
                      max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    ctx = MeshContext.create(data=8, model=1)

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(iter(train_b), ctx)

    cfg.optimizer.update(warm_start_lr_scale=0.25)
    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=str(tmp_path / "run"))
    # the seeded run tempers the peak LR (BASELINE.md r3 real-scale obs. 1):
    # capture the scale fit passes to _build_state
    seen = {}
    orig_build = trainer._build_state

    def spy(example, spe, lr_scale=1.0):
        seen["lr_scale"] = lr_scale
        return orig_build(example, spe, lr_scale=lr_scale)

    trainer._build_state = spy
    trainer.fit(train_batches, None, steps_per_epoch=len(train_b),
                warm_start_from=ckpt)
    assert seen["lr_scale"] == 0.25
    # the warm start carried the compat logit_scale into the flagship run's
    # checkpoint lineage (fit ran 1 epoch; scale moved but from 1.2345)
    from mammo_clip_tpu.train.checkpoint import restore_checkpoint
    from mammo_clip_tpu.train.state import create_train_state as cts  # noqa: F401

    assert os.path.isdir(str(tmp_path / "run" / "checkpoints"))

@pytest.mark.slow
def test_mid_epoch_resume_skips_trained_batches(tmp_path):
    """A preempted checkpoint resumes INSIDE the epoch: the already-trained
    batches are skipped (Batcher order is epoch-deterministic, the step RNG
    folds in state.step), so no step is duplicated. The reference restarts
    the epoch and reloads only model weights (trainer.py:108-112)."""
    from mammo_clip_tpu.train.checkpoint import save_checkpoint

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.train.update(log_every=100)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w

    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_b = Batcher(ImageTextDataset(_synthetic_df(16), store, split="train"), tok,
                      batch_size=8, max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    ctx = MeshContext.create(data=8, model=1)
    spe = len(train_b)
    assert spe == 2

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(iter(train_b), ctx)

    workdir = str(tmp_path / "run")
    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=workdir)

    # simulate a SIGTERM flush after 1 of 2 batches: a real first step gives us
    # a state at step 1, saved with the preempted marker
    first = next(iter(train_batches(0)))
    example = trainer.preprocess({k: v for k, v in first.items()}, None)
    state, _ = trainer._build_state(example, spe)
    from mammo_clip_tpu.train.step import make_train_step
    import jax

    step_fn = make_train_step(trainer.model, trainer.loss_fn,
                              preprocess=trainer.preprocess, donate=False)
    state, _ = step_fn(state, first, jax.random.PRNGKey(cfg.seed + 1))
    assert int(state.step) == 1
    save_checkpoint(f"{workdir}/checkpoints", state, config=cfg.to_dict(),
                    extra_meta={"epoch": 0, "preempted": True})

    final = Trainer(cfg, mesh_ctx=ctx, workdir=workdir).fit(
        train_batches, None, steps_per_epoch=spe, resume=True)
    # without the skip, the resumed run would retrain batch 0 and finish at 3
    assert int(final.step) == spe


@pytest.mark.slow
def test_trainer_steps_per_call_matches_single(tmp_path):
    """train.steps_per_call=2 (fused multi-step call, r4) must reproduce the
    steps_per_call=1 run: same final step counter and numerically matching
    params given identical batch order and seeds. Tolerances are
    rounding-realistic, not bit-exact: the scan-body compile context differs
    from the straight-line step at fp-reassociation level (the K=1 fused call
    IS bit-exact — tests/test_train.py::test_multistep_matches_sequential_steps)."""
    import jax

    from mammo_clip_tpu.data.pipeline import group_batches, stack_batches

    def run(workdir, k):
        cfg = tiny_test_config()
        cfg.scheduler.update(epochs=1, warmup_epochs=0)
        cfg.train.update(log_every=2, steps_per_call=k)
        h, w = cfg.data.image_size_h, cfg.data.image_size_w
        store = SyntheticImageStore((h, w))
        tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
        train_ds = ImageTextDataset(_synthetic_df(32), store, split="train")
        train_b = Batcher(train_ds, tok, batch_size=8,
                          max_length=cfg.data.text_max_length,
                          process_index=0, process_count=1)
        ctx = MeshContext.create(data=8, model=1)

        def train_batches(epoch):
            train_b.set_epoch(epoch)
            it = iter(train_b)
            if k > 1:
                it = (stack_batches(g) for g in group_batches(it, k))
            return prefetch_to_device(it, ctx, stacked=k > 1)

        trainer = Trainer(cfg, mesh_ctx=ctx, workdir=workdir)
        return trainer.fit(train_batches, None, steps_per_epoch=len(train_b)), jax

    s1, _ = run(str(tmp_path / "k1"), 1)
    s2, jax = run(str(tmp_path / "k2"), 2)
    assert int(s1.step) == int(s2.step) == 4  # 32 rows / bs8
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_mid_epoch_resume_with_steps_per_call(tmp_path):
    """Preemption + exact mid-epoch resume under the fused multi-step call
    (r4): state.step only advances in multiples of K, so a preempted
    checkpoint is always group-aligned and the resumed run must skip exactly
    the trained groups and finish the epoch at the effective horizon."""
    import jax

    from mammo_clip_tpu.data.pipeline import group_batches, stack_batches
    from mammo_clip_tpu.train.checkpoint import save_checkpoint
    from mammo_clip_tpu.train.step import make_train_multistep

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.train.update(log_every=100, steps_per_call=2)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_b = Batcher(ImageTextDataset(_synthetic_df(48), store, split="train"), tok,
                      batch_size=8, max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    ctx = MeshContext.create(data=8, model=1)
    spe = len(train_b)
    assert spe == 6  # -> 3 fused groups of K=2

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        it = (stack_batches(g) for g in group_batches(iter(train_b), 2))
        return prefetch_to_device(it, ctx, stacked=True)

    workdir = str(tmp_path / "run")
    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=workdir)

    # one REAL fused call (2 steps), then a preempted-marker checkpoint
    first = next(iter(train_batches(0)))
    example = trainer.preprocess(
        {k: v[0] for k, v in first.items()}, None)
    state, _ = trainer._build_state(example, spe)
    multi_fn = make_train_multistep(trainer.model, trainer.loss_fn,
                                    preprocess=trainer.preprocess, donate=False)
    state, _ = multi_fn(state, first, jax.random.PRNGKey(cfg.seed + 1))
    assert int(state.step) == 2
    save_checkpoint(f"{workdir}/checkpoints", state, config=cfg.to_dict(),
                    extra_meta={"epoch": 0, "preempted": True})

    final = Trainer(cfg, mesh_ctx=ctx, workdir=workdir).fit(
        train_batches, None, steps_per_epoch=spe, resume=True)
    # the resumed run must skip the trained group and stop at 6, not 8
    assert int(final.step) == spe


@pytest.mark.slow
def test_steps_per_call_composes_with_grad_accum():
    """optax.MultiSteps (grad accumulation) inside the fused scan: with
    accum=2 and K=4, one fused call performs exactly TWO real optimizer
    updates (mini_step wraps twice; gradient_step == 2) and matches four
    sequential single-step calls. Param tolerance is chaos-realistic, not
    tight: Adam's early update is ~lr*sign(g-hat) — discontinuous at g=0 —
    so ulp-level scan-context differences in the accumulated gradient flip
    near-zero elements by +-lr (measured; same mechanism as
    test_multistep_matches_sequential_steps)."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.losses import build_loss
    from mammo_clip_tpu.models import build_model
    from mammo_clip_tpu.train import (build_optimizer, create_train_state,
                                      make_train_multistep, make_train_step)

    cfg = tiny_test_config()
    cfg.optimizer.grad_accum_steps = 2
    model = build_model(cfg.model.to_dict())
    loss_fn = build_loss(cfg.loss.to_dict())
    # constant LR: the single real update lands at schedule count 0, where a
    # warmup schedule would emit LR=0 and mask the movement this test asserts
    tx = build_optimizer(cfg.optimizer.to_dict(), lambda s: 1e-3)
    rng = np.random.default_rng(0)
    h, w, s = cfg.data.image_size_h, cfg.data.image_size_w, cfg.data.text_max_length
    v = cfg.model.text_encoder.vocab_size
    ids = rng.integers(1, v, size=(4, s), dtype=np.int32)
    base = {
        "images": rng.standard_normal((4, h, w, 1)).astype(np.float32),
        "input_ids": ids, "attention_mask": np.ones((4, s), np.int32),
        "image_views": rng.standard_normal((4, h, w, 1)).astype(np.float32),
        "input_ids2": ids, "attention_mask2": np.ones((4, s), np.int32),
    }
    b1 = {k: jnp.asarray(x) for k, x in base.items()}
    bs = [b1]
    for _ in range(3):
        b = dict(b1)
        b["images"] = jnp.asarray(rng.standard_normal(base["images"].shape).astype(np.float32))
        bs.append(b)
    state = create_train_state(model, b1, tx, jax.random.PRNGKey(0))
    outer = jax.random.PRNGKey(5)

    step_fn = make_train_step(model, loss_fn, donate=False)
    s_seq = state
    for b in bs:
        s_seq, _ = step_fn(s_seq, b, outer)

    multi_fn = make_train_multistep(model, loss_fn, donate=False)
    stacked = {k: jnp.stack([b[k] for b in bs]) for k in b1}
    s_multi, _ = multi_fn(state, stacked, outer)

    assert int(s_multi.step) == int(s_seq.step) == 4
    # MultiSteps accounting threaded correctly through the scan carry:
    # 4 micro-steps at accum=2 -> mini_step wrapped to 0, TWO real updates
    assert int(s_multi.opt_state.mini_step) == 0
    assert int(s_multi.opt_state.gradient_step) == 2
    assert int(s_seq.opt_state.gradient_step) == 2
    # params must have moved from init AND track the sequential result
    moved = any(float(jnp.max(jnp.abs(a - b))) > 0
                for a, b in zip(jax.tree_util.tree_leaves(state.params),
                                jax.tree_util.tree_leaves(s_multi.params)))
    assert moved
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2, rtol=5e-2)


def test_steps_per_call_epoch_too_short_raises(tmp_path):
    """train.steps_per_call=K with an epoch of < K batches must fail FAST with
    an actionable message — not a bare StopIteration from the empty grouped
    iterator or a 0-step schedule assert deep in _build_state (r4 review)."""
    from mammo_clip_tpu.data.pipeline import group_batches, stack_batches

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.train.update(steps_per_call=2)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_b = Batcher(ImageTextDataset(_synthetic_df(8), store, split="train"), tok,
                      batch_size=8, max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    ctx = MeshContext.create(data=8, model=1)
    assert len(train_b) == 1  # 1 batch/epoch < K=2

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(
            (stack_batches(g) for g in group_batches(iter(train_b), 2)),
            ctx, stacked=True)

    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=str(tmp_path / "run"))
    with pytest.raises(ValueError, match="steps_per_call"):
        trainer.fit(train_batches, None, steps_per_epoch=len(train_b))


def test_resume_misaligned_steps_per_call_raises(tmp_path):
    """A preempted checkpoint written under a different steps_per_call must be
    rejected at resume: the group-skip arithmetic assumes state.step is a
    multiple of K, and silently dropping/re-training batches is worse than an
    error (r4 review)."""
    from mammo_clip_tpu.data.pipeline import group_batches, stack_batches
    from mammo_clip_tpu.train.checkpoint import save_checkpoint
    from mammo_clip_tpu.train.step import make_train_step
    import jax

    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    store = SyntheticImageStore((h, w))
    tok = HashTokenizer(vocab_size=cfg.model.text_encoder.vocab_size)
    train_b = Batcher(ImageTextDataset(_synthetic_df(32), store, split="train"), tok,
                      batch_size=8, max_length=cfg.data.text_max_length,
                      process_index=0, process_count=1)
    ctx = MeshContext.create(data=8, model=1)
    spe = len(train_b)
    assert spe == 4

    def single_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(iter(train_b), ctx)

    workdir = str(tmp_path / "run")
    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=workdir)
    # one K=1 step -> preempted checkpoint at step 1 (odd vs the new K=2)
    first = next(iter(single_batches(0)))
    example = trainer.preprocess({k: v for k, v in first.items()}, None)
    state, _ = trainer._build_state(example, spe)
    step_fn = make_train_step(trainer.model, trainer.loss_fn,
                              preprocess=trainer.preprocess, donate=False)
    state, _ = step_fn(state, first, jax.random.PRNGKey(cfg.seed + 1))
    save_checkpoint(f"{workdir}/checkpoints", state, config=cfg.to_dict(),
                    extra_meta={"epoch": 0, "preempted": True})

    cfg.train.update(steps_per_call=2)

    def stacked_batches(epoch):
        train_b.set_epoch(epoch)
        return prefetch_to_device(
            (stack_batches(g) for g in group_batches(iter(train_b), 2)),
            ctx, stacked=True)

    with pytest.raises(ValueError, match="steps_per_call"):
        Trainer(cfg, mesh_ctx=ctx, workdir=workdir).fit(
            stacked_batches, None, steps_per_epoch=spe, resume=True)
