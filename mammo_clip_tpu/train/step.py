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

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


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
