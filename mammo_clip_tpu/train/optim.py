"""Optimizer factory (reference: breastclip/optimizer/__init__.py:10-32).

AdamW / SGD via optax. The reference's no-decay param-group option exists but is
commented out in the shipped config (configs/optimizer/adamw.yaml:2), so the default
here likewise applies weight decay to every parameter; pass ``no_decay_patterns`` to
exclude e.g. biases / norm scales / logit_scale.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import optax


def _decay_mask(params, no_decay_patterns: Sequence[str]):
    regexes = [re.compile(p) for p in no_decay_patterns]

    def path_str(kp) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    return jax.tree_util.tree_map_with_path(
        lambda kp, _: not any(r.search(path_str(kp)) for r in regexes), params
    )


def build_optimizer(
    config: dict,
    schedule,
    params=None,
    no_decay_patterns: Optional[Sequence[str]] = None,
) -> optax.GradientTransformation:
    name = config.get("name", "adamw").lower()
    wd = config.get("weight_decay", 1e-4)
    if name == "adamw":
        mask = None
        if no_decay_patterns:
            assert params is not None, "params required to build the no-decay mask"
            mask = _decay_mask(params, no_decay_patterns)
        tx = optax.adamw(
            learning_rate=schedule,
            b1=config.get("beta1", 0.9),
            b2=config.get("beta2", 0.999),
            eps=config.get("eps", 1e-8),
            weight_decay=wd,
            mask=mask,
        )
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(learning_rate=schedule, momentum=config.get("momentum", 0.9)),
        )
    elif name == "adam":
        tx = optax.adam(learning_rate=schedule)
    else:
        raise KeyError(f"unknown optimizer: {name}")

    clip = config.get("grad_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    if config.get("flatten", False):
        assert not no_decay_patterns, (
            "optimizer.flatten is incompatible with no_decay_patterns: the "
            "decay mask is a per-leaf pytree and cannot follow the flattened "
            "parameter vector")
        # run the update on ONE flattened vector instead of ~600 small leaves:
        # the per-leaf HLO ops cost ~1us fixed each on TPU and dominate the
        # profile's unattributed tail (BASELINE.md r3 'other' bucket). Only
        # valid when no transform above is mask-/tree-structure-dependent
        # (no_decay masks are applied per-leaf BEFORE flattening by optax).
        tx = optax.flatten(tx)
    accum = int(config.get("grad_accum_steps", 1) or 1)
    if accum > 1:
        # large-batch parity on few chips (a knob the reference lacks — its
        # effective batch is fixed at 4/GPU x world size): average gradients
        # over k micro-steps and apply once. Clipping happens on the AVERAGED
        # gradient (inside the wrapped tx), matching what a true large batch
        # would do.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
