"""The pjit-compiled train / eval steps.

One fused XLA program per step: on-device augmentation (optional) -> dual-encoder
forward (bf16) -> global-batch contrastive loss (fp32 logits, GSPMD collectives over
ICI) -> backward -> AdamW update. Replaces the reference's hot loop
(reference: trainer_ddp.py:266-344 autocast forward / GradScaler backward / NCCL
all-reduce) with a single compiled function; optimizer state and params are donated so
the update is in-place in HBM.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .state import TrainState


def _make_step_fn(model, loss_fn: Callable, preprocess: Optional[Callable] = None):
    """The raw (uncompiled) train-step body shared by make_train_step and
    make_train_multistep."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, dropout_rng, stoch_rng = jax.random.split(rng, 3)
        if preprocess is not None:
            batch = preprocess(batch, aug_rng)

        def loss_of(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"dropout": dropout_rng, "stochastic": stoch_rng},
                mutable=["batch_stats"],
            )
            loss_dict = loss_fn(outputs, batch, True)
            return loss_dict["total"], (loss_dict, mutated.get("batch_stats", state.batch_stats))

        grad_fn = jax.value_and_grad(loss_of, has_aux=True)
        (_, (loss_dict, new_bs)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, loss_dict

    return step_fn


def make_train_step(
    model,
    loss_fn: Callable,
    preprocess: Optional[Callable] = None,
    donate: bool = True,
):
    """Build the jitted train step.

    preprocess: optional (batch, rng) -> batch on-device augmentation/normalization hook
    (see data/pipeline.py); it runs INSIDE the compiled step so augmentation fuses with
    the forward pass and never stalls the TPU on host work.
    """
    step_fn = _make_step_fn(model, loss_fn, preprocess)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_train_multistep(
    model,
    loss_fn: Callable,
    preprocess: Optional[Callable] = None,
    donate: bool = True,
):
    """Build a K-step fused train call: ``(state, batches, rng) -> (state, loss_dict)``
    where every leaf of ``batches`` carries a leading steps axis K (stack K host
    batches with :func:`mammo_clip_tpu.data.pipeline.stack_batches`).

    Runs the EXACT single-step body K times under ``lax.scan`` — the same
    math as K sequential ``make_train_step`` calls with the same per-step
    batches and the same outer ``rng`` (the body folds ``rng`` with
    ``state.step``, so each scanned step still draws distinct
    augmentation/dropout keys; BN momentum updates and optimizer state thread
    through the carry). The K=1 fused call is BIT-EXACT vs the single step;
    for K>1 XLA compiles the body in a loop context whose fusion order may
    differ at fp-rounding level (equality tested to rounding-realistic
    tolerances: tests/test_train.py::test_multistep_matches_sequential_steps).

    Why: on remote-dispatch TPU runtimes each jit call costs ~10+ ms of relay
    round-trip that grouped async dispatch does not hide (measured r4,
    BASELINE.md); one fused K-step call amortizes it to ~1/K. The scan body
    compiles once, so compile time matches the single step. Returned
    ``loss_dict`` is the LAST step's (what a sequential loop would log).
    """
    step_fn = _make_step_fn(model, loss_fn, preprocess)

    def multi_fn(state: TrainState, batches: Dict[str, jnp.ndarray], rng: jax.Array):
        def body(carry, batch):
            new_state, loss_dict = step_fn(carry, batch, rng)
            return new_state, loss_dict

        state, loss_dicts = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda x: x[-1], loss_dicts)

    return jax.jit(multi_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_fn: Callable, preprocess: Optional[Callable] = None):
    """Validation-loss step (reference: trainer.py:322-381), deterministic."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        b = preprocess(batch, None) if preprocess is not None else batch
        # eval_variables serves the EMA weights when optimizer.ema_decay is on:
        # validation loss — and therefore best-checkpoint selection — must judge
        # the weights that will actually be served (state.py eval contract).
        outputs = model.apply(state.eval_variables(), b, train=False)
        return loss_fn(outputs, b, False)

    return jax.jit(step_fn)
