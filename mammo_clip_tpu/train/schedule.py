"""LR schedules.

``warmup_cosine_sq_schedule`` reproduces the reference's per-step
LinearWarmupCosineAnnealingLR (reference: breastclip/scheduler/warmup_cosine.py:41-50):

    step <  W:  lr * step / max(1, W)
    step >= W:  lr * cos((step - W) / (T - W) * pi/2)^2    (clamped at >= 0)

The epoch->step conversion the reference does in the trainer (trainer.py:126-135) is
the caller's job: pass total/warmup in STEPS.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def schedule_horizon(epochs: int, warmup_epochs: int, steps_per_epoch: int,
                     grad_accum_steps: int = 1) -> tuple:
    """(total, warmup) in OPTIMIZER updates. With gradient accumulation,
    optax.MultiSteps advances the inner optimizer's schedule count only once
    per k micro-steps — so the horizon must be divided by k, or warmup/decay
    stretch k-fold and training ends far up the cosine curve."""
    total = epochs * steps_per_epoch
    warmup = warmup_epochs * steps_per_epoch
    k = max(1, int(grad_accum_steps or 1))
    if k > 1:
        total = max(1, total // k)
        warmup = min(warmup // k, total - 1)
    return total, warmup


def warmup_cosine_sq_schedule(base_lr: float, total_steps: int, warmup_steps: int) -> optax.Schedule:
    assert warmup_steps < total_steps, "warmup must be < total steps"

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        frac = (step - warmup_steps) / (total_steps - warmup_steps)
        decay = jnp.cos(frac * (jnp.pi / 2.0)) ** 2
        mult = jnp.where(step < warmup_steps, warm, decay)
        return base_lr * jnp.maximum(mult, 0.0)

    return schedule
