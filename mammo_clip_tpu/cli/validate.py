"""Offline checkpoint re-validation (reference: breastclip/validator.py:20-195).

Re-runs the validation loss over a range of saved checkpoint steps and re-selects the
best one — used when the training-time selection must be audited or recomputed with a
different validation set.

    python -m mammo_clip_tpu.cli.validate --workdir outputs/pretrain --config ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax

from ..core.config import Config, load_config
from ..core.mesh import MeshContext
from ..data.datamodule import DataModule
from ..data.pipeline import prefetch_to_device
from ..losses import build_loss
from ..models import build_model
from ..train.checkpoint import restore_checkpoint
from ..train.optim import build_optimizer
from ..train.schedule import warmup_cosine_sq_schedule
from ..train.state import create_train_state
from ..train.step import make_eval_step
from ..train.trainer import make_clip_preprocess
from ..utils.cache import enable_compile_cache


def main(argv=None) -> None:
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--config", default=None, help="defaults to <workdir>/config.yaml")
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="checkpoint steps to validate (default: all)")
    ap.add_argument("--loss-key", default="contrastive")
    args = ap.parse_args(argv)

    cfg = load_config(args.config or os.path.join(args.workdir, "config.yaml"))
    ctx = MeshContext.create()
    model = build_model(cfg.model.to_dict())
    loss_fn = build_loss(cfg.loss.to_dict())
    preprocess = make_clip_preprocess(cfg)
    dm = DataModule(cfg)
    valid_b = dm.batcher("valid",
                         batch_size=ctx.global_batch_size(cfg.data.batch_size_per_device))

    first = next(iter(valid_b))
    example = preprocess(ctx.shard_host_batch(first), None)
    tx = build_optimizer(cfg.optimizer.to_dict(), warmup_cosine_sq_schedule(cfg.optimizer.lr, 100, 10))
    template = create_train_state(model, example, tx, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model, loss_fn, preprocess=preprocess)

    ckpt_dir = os.path.join(args.workdir, "checkpoints")
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        steps = args.steps or mgr.all_steps()

    results = {}
    for step in sorted(steps):
        state, _, meta = restore_checkpoint(ckpt_dir, template, step=step)
        # orbax restores arrays COMMITTED to the template's device; committed
        # single-device leaves cannot mix with mesh-sharded batches in the jitted
        # eval step (same hazard as Trainer resume, train/trainer.py). Round-trip
        # through host to uncommit.
        state = jax.tree_util.tree_map(
            lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state
        )
        losses = []
        for batch in prefetch_to_device(iter(valid_b), ctx):
            ld = eval_step(state, batch)
            losses.append(float(ld.get(args.loss_key, ld["total"])))
        results[step] = float(np.mean(losses))
        print(f"step {step} (epoch {meta.get('epoch')}): {args.loss_key}={results[step]:.5f}")

    best = min(results, key=results.get)
    print(json.dumps({"best_step": best, "losses": results}))


if __name__ == "__main__":
    main()
