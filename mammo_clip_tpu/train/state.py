"""Training state: params + batch_stats + optimizer state, fully functional.

Replaces the reference's mutable (model, optimizer, scheduler, GradScaler) quartet
(reference: trainer.py:115-156). No GradScaler: TPU trains in bf16 with fp32 master
params — no loss scaling needed (SURVEY.md §2.2 AMP row).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_params: Any = None  # exponential moving average of params (production
    #   pretraining stabilizer the reference lacks); None = disabled
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = jnp.asarray(self.ema_decay, jnp.float32)
            # Under optax.MultiSteps the params change only on the micro-step
            # whose update wraps mini_step back to 0; blending EMA on the k-1
            # accumulation-only steps would shrink the effective horizon to
            # decay**k. Freeze the blend (decay=1) on those steps.
            mini_step = getattr(new_opt_state, "mini_step", None)
            if mini_step is not None:
                d = jnp.where(mini_step == 0, d, 1.0)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            ema_params=new_ema,
        )

    def eval_variables(self, use_ema: bool = True):
        """Variables for evaluation: EMA weights when tracked, else current."""
        p = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        return {"params": p, "batch_stats": self.batch_stats}


def create_train_state(
    model,
    example_batch: Dict[str, jnp.ndarray],
    tx: optax.GradientTransformation,
    rng: jax.Array,
    train: bool = False,
    ema_decay: float = 0.0,
) -> TrainState:
    """Initialize model variables from an example batch and wrap them in a
    TrainState. ``ema_decay > 0`` additionally tracks an exponential moving
    average of the parameters (evaluate via ``state.eval_variables()``)."""
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1),
                 "stochastic": jax.random.fold_in(rng, 2)}
    # jitted init: one compiled program instead of hundreds of eager op dispatches
    # (critical on remote-dispatch TPU runtimes where each eager op is a round trip)
    init_fn = jax.jit(lambda rngs, batch: model.init(rngs, batch, train=train))
    variables = init_fn(init_rngs, example_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None,
        ema_decay=ema_decay,
        tx=tx,
    )
