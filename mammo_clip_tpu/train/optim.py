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


def _hybrid_views(tree, threshold_bytes: int):
    """Split a pytree's leaves into one flat vector per dtype (leaves whose
    byte size is <= threshold) plus the remaining big leaves kept as-is.

    The assignment depends only on leaf shapes/dtypes, so it is identical on
    every call under jit tracing. Returns (hybrid, rebuild) where ``hybrid``
    is {"flat": {dtype_name: vec}, "big": [leaf, ...]} and ``rebuild`` maps a
    same-structured hybrid back to the original tree structure.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    small_idx, flat_groups = [], {}
    for i, leaf in enumerate(leaves):
        nbytes = leaf.size * leaf.dtype.itemsize
        if nbytes <= threshold_bytes:
            small_idx.append(i)
            flat_groups.setdefault(str(leaf.dtype), []).append(i)
    hybrid = {
        "flat": {
            d: jnp.concatenate([leaves[i].ravel() for i in idxs])
            for d, idxs in flat_groups.items()
        },
        "big": [leaves[i] for i in range(len(leaves)) if i not in set(small_idx)],
    }
    shapes = [leaves[i].shape for i in range(len(leaves))]

    def rebuild(h):
        out = [None] * len(leaves)
        for d, idxs in flat_groups.items():
            vec, off = h["flat"][d], 0
            for i in idxs:
                n = int(np_prod(shapes[i]))
                out[i] = vec[off:off + n].reshape(shapes[i])
                off += n
        big_iter = iter(h["big"])
        for i in range(len(leaves)):
            if out[i] is None:
                out[i] = next(big_iter)
        return jax.tree_util.tree_unflatten(treedef, out)

    return hybrid, rebuild


def np_prod(shape) -> int:
    n = 1
    for s in shape:
        n *= int(s)
    return n


def flatten_small(
    inner: optax.GradientTransformation, threshold_bytes: int = 1 << 18
) -> optax.GradientTransformation:
    """Bucketed optax.flatten: fuse only the SMALL leaves into one vector.

    Rationale (BASELINE.md r3 optimizer-tail probes): per-leaf update ops cost
    ~1us fixed each on TPU and the param tree has ~600 leaves, but full
    optax.flatten moves 0.6 GB/step of fp32 copies for the big conv kernels
    and measured NEGATIVE. The launch tail is leaf-COUNT-dominated while the
    copy traffic is leaf-BYTES-dominated, and the distributions are opposite:
    most leaves are tiny (BN scales/biases, biases, small kernels). Fusing
    only leaves <= threshold kills most of the op tail while copying only a
    few MB. Valid only for elementwise inner transforms (+ global-norm clip,
    which sums the same squares either way) — same contract as optax.flatten.

    Single-chip knob: on a mesh, shard_train_state places optimizer moments by
    matching param paths, which the hybrid {"flat","big"} tree doesn't follow —
    those moments would replicate (correct, but defeats FSDP). Keep it off for
    sharded training.
    """

    def init(params):
        hybrid, _ = _hybrid_views(params, threshold_bytes)
        return inner.init(hybrid)

    def update(updates, state, params=None):
        h_up, rebuild = _hybrid_views(updates, threshold_bytes)
        h_par = None
        if params is not None:
            h_par, _ = _hybrid_views(params, threshold_bytes)
        new_up, new_state = inner.update(h_up, state, h_par)
        return rebuild(new_up), new_state

    return optax.GradientTransformation(init, update)


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
    small = config.get("flatten_small_bytes")
    if small:
        assert not no_decay_patterns, (
            "optimizer.flatten_small_bytes is incompatible with "
            "no_decay_patterns (per-leaf mask cannot follow fused leaves)")
        assert not config.get("flatten", False), "pick one flatten mode"
        tx = flatten_small(tx, threshold_bytes=int(small))
    accum = int(config.get("grad_accum_steps", 1) or 1)
    if accum > 1:
        # large-batch parity on few chips (a knob the reference lacks — its
        # effective batch is fixed at 4/GPU x world size): average gradients
        # over k micro-steps and apply once. Clipping happens on the AVERAGED
        # gradient (inside the wrapped tx), matching what a true large batch
        # would do.
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
