"""Orbax checkpointing with the reference's cross-stack contract.

The reference's checkpoint IS its cross-stack API: a torch ``.tar`` holding
``{model, optimizer, scheduler, config, epoch, train_loss}`` (reference:
trainer.py:219-230); downstream consumers rebuild the encoder from the embedded config
(breast_clip_classifier.py:10-17). This module reproduces that contract with Orbax
sharded checkpoints: payload ``{params, batch_stats, opt_state, step}`` plus a
``config.json`` + ``meta.json`` sidecar.

Two reference gaps fixed on purpose (SURVEY.md §5 checkpoint/resume):
* optimizer/scheduler state is actually RESTORED on resume (the reference saves it but
  reloads only model weights, trainer.py:108-112);
* checkpoints are sharded/async-friendly rather than a single host pickle.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..core.config import Config


def _manager(directory: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(
    directory: str,
    state,
    config: Optional[Dict] = None,
    step: Optional[int] = None,
    extra_meta: Optional[Dict[str, Any]] = None,
    max_to_keep: Optional[int] = None,
    extra_arrays: Optional[Dict[str, Any]] = None,
) -> None:
    """Save {params, batch_stats, opt_state, step} at ``directory/<step>``; embed config.

    ``extra_arrays`` writes an ``arrays.npz`` sidecar next to meta.json — used by
    the downstream drivers to persist the validation predictions the reference
    embeds in its best checkpoints for offline re-scoring
    (reference: Classifiers/experiments.py:193-222). Read back with
    ``load_checkpoint_arrays``."""
    directory = os.path.abspath(directory)
    step = int(state.step) if step is None else int(step)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = state.ema_params
    with _manager(directory, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {"step": step}
        if extra_meta:
            meta.update(extra_meta)
        with open(os.path.join(directory, str(step), "meta.json"), "w") as f:
            json.dump(meta, f)
        if config is not None:
            with open(os.path.join(directory, str(step), "config.json"), "w") as f:
                f.write(Config(config).to_json())
        if extra_arrays:
            import numpy as np

            np.savez_compressed(
                os.path.join(directory, str(step), "arrays.npz"),
                **{k: np.asarray(v) for k, v in extra_arrays.items()},
            )


def load_checkpoint_arrays(directory: str, step: Optional[int] = None) -> Dict[str, Any]:
    """Read back the ``extra_arrays`` sidecar of ``save_checkpoint`` (e.g. the
    persisted validation predictions). Returns {} when none was saved."""
    import numpy as np

    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
    path = os.path.join(directory, str(step), "arrays.npz")
    if not os.path.exists(path):
        return {}
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def latest_step(directory: str) -> Optional[int]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def _stored_has_ema(directory: str, mgr: ocp.CheckpointManager, step: int) -> bool:
    """True when the stored payload at ``step`` contains an ema_params tree."""
    md = mgr.item_metadata(step)
    if md is not None:  # None: a fresh manager can't infer the item handler
        return "ema_params" in md.keys()
    # Fall back to orbax's on-disk pytree metadata (tree_metadata keys are
    # stringified key paths like "('params', 'w')").
    meta_path = os.path.join(directory, str(step), "default", "_METADATA")
    try:
        with open(meta_path) as f:
            tree = json.load(f).get("tree_metadata", {})
        return any(k.startswith("('ema_params'") for k in tree)
    except OSError:
        # Metadata unavailable (older layout): assume EMA is present so a
        # genuine mismatch surfaces as a loud restore error rather than a
        # silent EMA re-seed.
        return True


def restore_checkpoint(directory: str, template_state, step: Optional[int] = None):
    """Restore a TrainState saved by save_checkpoint. ``template_state`` supplies the
    tree structure/shardings (create it with create_train_state on abstract or real
    arrays). Returns (state, config_dict_or_None, meta)."""
    directory = os.path.abspath(directory)
    with _manager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        assert step is not None, f"no checkpoint found under {directory}"
        template = {
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
        }
        if getattr(template_state, "ema_params", None) is not None:
            # Resuming a pre-EMA checkpoint with ema_decay now enabled: the
            # stored tree lacks ema_params and orbax rejects the bigger
            # template. Probe the stored keys (not a blanket retry — a retry
            # would also swallow unrelated restore failures and silently
            # re-seed EMA from raw params, losing trained EMA weights) and
            # include ema_params only when the checkpoint actually has it.
            if _stored_has_ema(directory, mgr, step):
                template["ema_params"] = template_state.ema_params
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    ema = restored.get("ema_params")
    if ema is None and getattr(template_state, "ema_params", None) is not None:
        ema = jax.tree_util.tree_map(lambda a: a.copy(), restored["params"])
    state = template_state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=ema,
    )
    config = None
    cfg_path = os.path.join(directory, str(step), "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = Config.from_json(f.read())
    meta = {}
    meta_path = os.path.join(directory, str(step), "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, config, meta
