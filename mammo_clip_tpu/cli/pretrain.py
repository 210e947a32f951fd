"""Pretraining CLI (reference: src/codebase/train.py:13-36 + the Hydra config tree).

    python -m mammo_clip_tpu.cli.pretrain --config configs/pretrain_b5.yaml \
        [--workdir outputs/b5] [--resume] [key.path=value ...]

One entry point for single-chip and multi-chip: GSPMD handles the device layout (the
reference dispatches to run vs run_ddp on LOCAL_RANK, train.py:29-32).
"""

from __future__ import annotations

import argparse

from ..core.config import default_pretrain_config, load_config, save_config
from ..core.mesh import MeshContext, is_master
from ..data.datamodule import DataModule
from ..data.pipeline import group_batches, prefetch_to_device, stack_batches
from ..train.trainer import Trainer
from ..utils.cache import enable_compile_cache


def main(argv=None) -> None:
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config; defaults to the b5 recipe")
    ap.add_argument("--variant", default="b5", choices=["b2", "b5"])
    ap.add_argument("--workdir", default="outputs/pretrain")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--warm-start-from", default=None,
                    help="checkpoint dir of a reference-exact model to seed a "
                    "tpu_optimized run from (convert/flagship_init; deep "
                    "stages + text tower copied, s2d front fresh)")
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--data-frac", type=float, default=1.0)
    ap.add_argument("overrides", nargs="*", help="dotted-path config overrides (a.b=c)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else default_pretrain_config(args.variant)
    if args.overrides:
        cfg = cfg.apply_overrides(args.overrides)

    ctx = MeshContext.create(**{k: v for k, v in cfg.get("mesh", {}).items()})
    dm = DataModule(cfg, cur_fold=args.fold, data_frac=args.data_frac)
    global_bs = ctx.global_batch_size(cfg.data.batch_size_per_device)
    train_b = dm.batcher("train", batch_size=global_bs)
    valid_b = dm.batcher("valid", batch_size=global_bs) if cfg.data.get("valid") else None

    if is_master():
        save_config(cfg, f"{args.workdir}/config.yaml") if _ensure_dir(args.workdir) else None

    # train.steps_per_call=K fuses K optimizer steps into one jit call
    # (train/step.make_train_multistep): host stacks K batches -> one transfer
    # -> one dispatch; amortizes the remote-relay call latency (BASELINE.md r4)
    k_steps = int(cfg.train.get("steps_per_call", 1))

    def train_batches(epoch):
        train_b.set_epoch(epoch)
        it = iter(train_b)
        if k_steps > 1:
            it = (stack_batches(g) for g in group_batches(it, k_steps))
        return prefetch_to_device(it, ctx, stacked=k_steps > 1)

    valid_batches = None
    if valid_b is not None:
        def valid_batches(epoch):  # noqa: F811
            return prefetch_to_device(iter(valid_b), ctx)

    trainer = Trainer(cfg, mesh_ctx=ctx, workdir=args.workdir)
    trainer.fit(
        train_batches,
        valid_batches,
        steps_per_epoch=len(train_b),
        resume=args.resume,
        warm_start_from=args.warm_start_from,
    )


def _ensure_dir(d: str) -> bool:
    import os

    os.makedirs(d, exist_ok=True)
    return True


if __name__ == "__main__":
    main()
