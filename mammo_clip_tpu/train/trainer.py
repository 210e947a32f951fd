"""Pretraining driver: epoch loop, validation, best-checkpoint selection, resume.

Replaces the reference's twin trainers (reference: breastclip/trainer.py:29-382 single
device, trainer_ddp.py:42-409 DDP) with ONE driver — under GSPMD there is no separate
DDP code path, no process-group bootstrap, no GradScaler, and no master-only branching
beyond host I/O gating. Known reference bugs not replicated: the 11-step epoch
truncation debug leftover (trainer_ddp.py:338-339,402-403) and the
resume-without-optimizer-state gap (trainer.py:108-112).

Observability: per-step scalars (loss sub-terms, LR, step time, images/sec) flow
through MetricsLogger (utils/logging.py) every ``log_every`` steps (reference logged
every 30, trainer.py:294-302); per-epoch per-dataset validation losses select the best
checkpoint by ``train.loss_best`` (reference trainer.py:215-237).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..core.config import Config
from ..core.mesh import MeshContext, is_master
from ..losses import build_loss
from ..models import build_model
from ..ops.augment import AugmentConfig, augment_batch, augment_two_views
from ..utils.logging import MetricsLogger
from .checkpoint import restore_checkpoint, save_checkpoint
from .optim import build_optimizer
from .schedule import schedule_horizon, warmup_cosine_sq_schedule
from .state import create_train_state
from .step import make_eval_step, make_train_multistep, make_train_step


def make_clip_preprocess(cfg: Config) -> Callable:
    """On-device augmentation + normalization hook for the CLIP train step."""
    aug = AugmentConfig.from_dict(cfg.augment.to_dict())
    mean, std = cfg.data.mean, cfg.data.std
    # the TPU-native recipe emits augmented images in bf16 (the encoder casts
    # at entry anyway; halves the full-res bytes between warp and stem). The
    # compat path stays fp32 end-to-end. Override with augment.out_bf16.
    out_dtype = None
    if cfg.augment.get("out_bf16",
                       bool(cfg.model.image_encoder.get("tpu_optimized", False))):
        import jax.numpy as jnp

        out_dtype = jnp.bfloat16

    def preprocess(batch, rng):
        batch = dict(batch)
        if rng is None:  # eval: normalize only
            batch["images"] = augment_batch(batch["images"], None, aug, mean, std, train=False)
            if "image_views" in batch:
                batch["image_views"] = augment_batch(batch["image_views"], None, aug, mean, std, train=False)
            return batch
        if "image_views" in batch:
            # one warp invocation for both views (halves the fixed per-call costs)
            batch["images"], batch["image_views"] = augment_two_views(
                batch["images"], batch["image_views"], rng, aug, mean, std, train=True,
                out_dtype=out_dtype,
            )
        else:
            batch["images"] = augment_batch(batch["images"], rng, aug, mean, std, train=True,
                                            out_dtype=out_dtype)
        return batch

    return preprocess



def _finite_or_none(x):
    """JSON-safe best-val: meta.json must stay standard JSON (no Infinity)."""
    x = float(x)
    return x if np.isfinite(x) else None


class Trainer:
    """Config-driven pretraining driver.

    train_batches / valid_batches: callables (epoch) -> iterable of host batches
    (e.g. data.pipeline.Batcher with set_epoch + prefetch_to_device).
    """

    def __init__(
        self,
        cfg: Config,
        mesh_ctx: Optional[MeshContext] = None,
        workdir: str = "./outputs",
        dtype=None,
    ):
        import jax.numpy as jnp

        self.cfg = cfg
        if cfg.train.get("rng_impl"):  # e.g. 'unsafe_rbg': hardware RNG, ~free on TPU
            jax.config.update("jax_default_prng_impl", cfg.train.rng_impl)
        self.ctx = mesh_ctx or MeshContext.create()
        self.workdir = workdir
        dtype = dtype or (jnp.bfloat16 if cfg.train.get("dtype") == "bfloat16" else jnp.float32)
        self.model = build_model(cfg.model.to_dict(), dtype=dtype)
        self.loss_fn = build_loss(cfg.loss.to_dict())
        self.preprocess = make_clip_preprocess(cfg)
        self.logger = MetricsLogger(workdir, enabled=is_master())
        self._train_step = None
        self._eval_step = None

    def _build_state(self, example_batch, steps_per_epoch: int, lr_scale: float = 1.0):
        cfg = self.cfg
        total, warmup = schedule_horizon(
            cfg.scheduler.epochs, cfg.scheduler.warmup_epochs, steps_per_epoch,
            cfg.optimizer.get("grad_accum_steps", 1),
        )
        schedule = warmup_cosine_sq_schedule(cfg.optimizer.lr * lr_scale, total, warmup)
        self._schedule = schedule  # kept for LR observability (reference logs
        #                            LR scalars every 30 steps, trainer.py:294-302)
        tx = build_optimizer(cfg.optimizer.to_dict(), schedule)
        state = create_train_state(
            self.model, example_batch, tx, jax.random.PRNGKey(cfg.seed),
            ema_decay=cfg.optimizer.get("ema_decay", 0.0),
        )
        return state, tx

    def fit(
        self,
        train_batches: Callable[[int], Iterable],
        valid_batches: Optional[Callable[[int], Iterable]] = None,
        steps_per_epoch: Optional[int] = None,
        resume: bool = False,
        warm_start_from: Optional[str] = None,
    ):
        cfg = self.cfg
        epochs = cfg.scheduler.epochs
        # train.steps_per_call=K fuses K optimizer steps into ONE jit call
        # (make_train_multistep): on remote-dispatch TPU runtimes each call
        # costs ~10+ ms of relay round-trip that async dispatch does not hide
        # (BASELINE.md r4); K amortizes it to ~1/K with the same math
        # (bit-exact at K=1; tests/test_train.py has the equality evidence).
        # Contract: train_batches then yields STACKED (K, B, ...) super-batches
        # (data.pipeline.stack_batches / group_batches — see cli/pretrain.py).
        K = int(cfg.train.get("steps_per_call", 1))
        assert steps_per_epoch, "steps_per_epoch required (len(batcher))"
        # the final partial group of each epoch is dropped (shape-static fused
        # call); the schedule horizon and resume math count the steps actually
        # taken. Guard BEFORE consuming the iterator: with < K batches,
        # group_batches yields nothing and next() below would die with a bare
        # StopIteration far from the cause.
        steps_per_epoch = steps_per_epoch - steps_per_epoch % K
        if steps_per_epoch == 0:
            raise ValueError(
                f"epoch has fewer batches than train.steps_per_call={K} — the "
                "fused call drops the final partial group, leaving zero steps; "
                "lower steps_per_call or raise the per-epoch batch count")
        first = next(iter(train_batches(0)))
        if K > 1:  # init example is a single step's batch
            first = jax.tree_util.tree_map(lambda x: x[0], first)
        example = self.preprocess({k: v for k, v in first.items()}, None)
        # Warm-started runs want a gentler peak LR: trained at the scratch
        # recipe's full peak, the seeded real-scale arm drifted upward past
        # convergence (BASELINE.md r3 "real-scale learning", observation 1) —
        # the standard fine-tuning adjustment, opt-in via optimizer config.
        lr_scale = (float(cfg.optimizer.get("warm_start_lr_scale", 1.0))
                    if warm_start_from else 1.0)
        state, tx = self._build_state(example, steps_per_epoch, lr_scale=lr_scale)
        if warm_start_from:
            # seed from a reference-exact checkpoint (convert/flagship_init):
            # deep stages / text tower / projections copied, s2d front fresh
            from ..convert.flagship_init import flagship_warm_start
            from ..eval.loading import load_clip_for_eval

            _, src_vars, _ = load_clip_for_eval(warm_start_from)
            seeded = flagship_warm_start(
                src_vars, {"params": state.params, "batch_stats": state.batch_stats})
            state = state.replace(params=seeded["params"],
                                  batch_stats=seeded["batch_stats"])
            if is_master():
                print(f"warm-started from {warm_start_from}")
        start_epoch = 0
        skip_batches = 0
        best_val = np.inf
        if resume:
            try:
                state, _, meta = restore_checkpoint(f"{self.workdir}/checkpoints", state)
                # orbax restores arrays COMMITTED to the template's device; committed
                # single-device leaves cannot mix with mesh-sharded batches in the
                # jitted step (fresh-init leaves are uncommitted, which is why the
                # first fit works). Round-trip through host to uncommit.
                state = jax.tree_util.tree_map(
                    lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state
                )
                start_epoch = int(meta.get("epoch", int(state.step) // steps_per_epoch))
                if meta.get("preempted"):
                    # EXACT mid-epoch resume: the Batcher's order is a pure
                    # function of the epoch (set_epoch) and the step RNG folds
                    # in state.step, so skipping the already-trained batches
                    # continues the preempted epoch without duplicating any
                    # step (the reference restarts the epoch AND reloads only
                    # model weights, trainer.py:108-112).
                    skip_batches = max(0, int(state.step) - start_epoch * steps_per_epoch)
                    if skip_batches % K:
                        raise ValueError(
                            f"mid-epoch resume at step {int(state.step)} is not "
                            f"aligned to train.steps_per_call={K}: the checkpoint "
                            "was written under a different steps_per_call, so the "
                            "group skip below would silently drop or re-train "
                            "batches — resume with the original value (or restart "
                            "the epoch by clearing the preempted flag)")
                # restore the best-so-far metric so the first post-resume epoch
                # cannot overwrite best/ with a worse checkpoint
                if meta.get("best_val") is not None:
                    best_val = float(meta["best_val"])
                if is_master():
                    print(f"resumed from epoch {start_epoch} (step {int(state.step)})"
                          + (f", skipping {skip_batches} trained batches"
                             if skip_batches else ""))
            except (AssertionError, FileNotFoundError):
                pass

        if K > 1:
            self._train_step = make_train_multistep(self.model, self.loss_fn, preprocess=self.preprocess)
        else:
            self._train_step = make_train_step(self.model, self.loss_fn, preprocess=self.preprocess)
        self._eval_step = make_eval_step(self.model, self.loss_fn, preprocess=self.preprocess)

        loss_best_key = cfg.train.get("loss_best", "total")
        rng = jax.random.PRNGKey(cfg.seed + 1)
        log_every = cfg.train.get("log_every", 30)

        # In-training profiler window (SURVEY §5: the reference has no tracing
        # subsystem): train.profile_at_step=N captures a jax.profiler trace of
        # train.profile_num_steps steps starting at global step N into
        # workdir/profile (view in TensorBoard/xprof). Master process only.
        prof_at = int(cfg.train.get("profile_at_step", -1))
        prof_len = int(cfg.train.get("profile_num_steps", 5))
        prof_left = 0  # >0 while a trace is open

        # preemption-safe checkpointing: TPU pods get SIGTERM'd on maintenance; flush a
        # checkpoint before dying so resume loses at most one epoch's steps. (The
        # reference has no failure handling at all — SURVEY.md §5.)
        import signal

        preempted = {"flag": False}

        def _on_term(signum, frame):
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # non-main thread (tests)
            prev_handler = None

        for epoch in range(start_epoch, epochs):
            t_epoch = time.time()
            n_imgs = 0
            last_t = time.time()
            for i, batch in enumerate(train_batches(epoch)):
                if epoch == start_epoch and i * K < skip_batches:
                    continue  # mid-epoch resume: batch already trained pre-preemption
                    # (state.step only ever advances in multiples of K, so the
                    # skipped step count is always group-aligned)
                step_now = int(state.step)
                if prof_at >= 0 and step_now <= prof_at < step_now + K and is_master():
                    jax.profiler.start_trace(f"{self.workdir}/profile")
                    prof_left = -(-prof_len // K)  # whole fused calls
                state, loss_dict = self._train_step(state, batch, rng)
                if prof_left > 0:
                    prof_left -= 1
                    if prof_left == 0:
                        float(loss_dict["total"])  # force completion inside the trace
                        jax.profiler.stop_trace()
                n_imgs += int(np.prod(batch["images"].shape[:2]) if K > 1
                              else batch["images"].shape[0])
                if preempted["flag"]:
                    if prof_left > 0:  # don't leak an open trace on preemption
                        jax.profiler.stop_trace()
                        prof_left = 0
                    if is_master():
                        save_checkpoint(
                            f"{self.workdir}/checkpoints", state, config=cfg.to_dict(),
                            extra_meta={"epoch": epoch, "preempted": True,
                                        "best_val": _finite_or_none(best_val)},
                        )
                        print(f"SIGTERM: checkpoint flushed at step {int(state.step)}")
                    self.logger.close()
                    return state
                # every log_every STEPS (a fused call advances K at once)
                if ((i + 1) * K) // log_every > (i * K) // log_every:
                    now = time.time()
                    scalars = {f"loss/{k}": float(v) for k, v in loss_dict.items()}
                    scalars["perf/images_per_sec"] = n_imgs / (now - last_t)
                    # LR at the current optimizer update (micro-steps / accum
                    # under optax.MultiSteps) — the reference's per-30-step LR
                    # scalar (trainer.py:294-302)
                    accum = cfg.optimizer.get("grad_accum_steps", 1)
                    scalars["perf/lr"] = float(self._schedule(int(state.step) // accum))
                    self.logger.log(int(state.step), scalars, prefix="train")
                    n_imgs, last_t = 0, now

            val_metrics = {}
            if valid_batches is not None:
                accum: Dict[str, list] = {}
                for batch in valid_batches(epoch):
                    ld = self._eval_step(state, batch)
                    for k, v in ld.items():
                        accum.setdefault(k, []).append(float(v))
                val_metrics = {k: float(np.mean(v)) for k, v in accum.items()}
                self.logger.log(int(state.step), {f"loss/{k}": v for k, v in val_metrics.items()}, prefix="valid")

            if is_master():
                key = loss_best_key if loss_best_key in val_metrics else "total"
                # no validation data -> every epoch "improves" so a best/ always exists
                cur = val_metrics.get(key, -float(epoch + 1))
                if cur < best_val:
                    best_val = cur
                    save_checkpoint(
                        f"{self.workdir}/best",
                        state,
                        config=cfg.to_dict(),
                        extra_meta={"epoch": epoch + 1, "val": val_metrics},
                        max_to_keep=1,
                    )
                # best_val is updated first so the resume checkpoint records the
                # metric INCLUDING this epoch (resume must never regress best/)
                save_checkpoint(
                    f"{self.workdir}/checkpoints",
                    state,
                    config=cfg.to_dict(),
                    extra_meta={"epoch": epoch + 1, "val": val_metrics,
                                "best_val": _finite_or_none(best_val)},
                )
                print(
                    f"epoch {epoch + 1}/{epochs} done in {time.time() - t_epoch:.1f}s "
                    f"val={val_metrics.get(key, float('nan')):.4f} best={best_val:.4f}"
                )
        if prof_left > 0:  # window crossed the end of training: close it
            jax.profiler.stop_trace()
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        self.logger.close()
        return state
