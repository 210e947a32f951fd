"""Multi-chip weak-scaling benchmark — pre-staged for real pods (ROADMAP #6).

This pod exposes ONE real TPU chip, so real scaling curves cannot be measured
here; what CAN be built and certified now is the harness, so that on a real
pod the curve is one command (the same pattern as ``parity/run_parity.py``
for the egress-blocked real-data quality runs):

    python benchmarks/multichip_scaling.py --recipe flagship \
        --mesh-sizes 1,2,4,8 --per-device-batch 8

It times the SAME fused train step ``bench.py`` measures (single source of
truth: ``train/recipes.build_bench_train``) under a ``('data','model')`` /
``('replica','data','model')`` GSPMD mesh at each requested size, holding the
per-device batch fixed (weak scaling: the contrastive global batch — and the
all-gathered negative set, reference semantics ``util/dist_autograd.py:5-27``
— grows with the mesh), and reports per-chip throughput plus weak-scaling
efficiency relative to the smallest mesh.

``--selftest`` runs the tiny end-to-end config on the virtual CPU mesh
(exactly how ``__graft_entry__.dryrun_multichip`` and tests/ validate
sharding on this pod): it certifies the harness — mesh construction, state
and (K,B,...) super-batch sharding, the timing/sync protocol — not TPU
numbers. CPU "throughput" is printed but explicitly labeled platform=cpu.

Sync protocol matches bench.py: dispatch a group of fused calls, then fetch
ONE loss scalar — ``block_until_ready`` alone can ACK before the relay
finishes executing (CLAUDE.md), and per-step fetches would serialize the
pipeline the way no real training loop does.

Prints one JSON line per mesh size and a final summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

WARMUP_GROUPS = 2
GROUP = 5  # dispatches per scalar fetch, same as bench.py


def _host_batch(cfg, global_batch: int, rng: np.random.Generator):
    """uint8 views + token ids, exactly the shapes bench.py feeds."""
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    seq = cfg.data.text_max_length
    ids = rng.integers(1, cfg.model.text_encoder.vocab_size,
                       size=(global_batch, seq), dtype=np.int32)
    return {
        "images": rng.integers(0, 255, size=(global_batch, h, w, 1), dtype=np.uint8),
        "image_views": rng.integers(0, 255, size=(global_batch, h, w, 1), dtype=np.uint8),
        "input_ids": ids,
        "attention_mask": np.ones((global_batch, seq), np.int32),
        "input_ids2": ids,
        "attention_mask2": np.ones((global_batch, seq), np.int32),
    }


def _measure_mesh(cfg, n_devices: int, args) -> dict:
    """Build the bench train step on an n-device mesh and time it."""
    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.core.mesh import MeshContext
    from mammo_clip_tpu.parallel import shard_train_state
    from mammo_clip_tpu.train import create_train_state
    from mammo_clip_tpu.train.recipes import build_bench_train

    devices = jax.devices()[:n_devices]
    tp = args.tp if n_devices % args.tp == 0 and n_devices >= args.tp else 1
    replica = (args.replica
               if n_devices % (args.replica * tp) == 0 and n_devices >= args.replica * tp
               else 1)
    ctx = MeshContext.create(data=n_devices // (tp * replica), model=tp,
                             replica=replica, devices=devices)

    if getattr(args, "seq_parallel", False):
        # opt-in Megatron-SP (r5): the constraint is inert unless the jitted
        # calls below run under an active mesh context, provided by the
        # jax.set_mesh wrapper around the build/measure block
        import copy as _copy

        cfg = _copy.deepcopy(cfg)
        cfg.model.text_encoder.seq_parallel = True

    model, _loss_fn, tx, _pre, train_step = build_bench_train(
        cfg, compat=(args.recipe == "compat"), k_steps=args.steps_per_call)

    data_par = ctx.data_parallelism * ctx.replica_parallelism
    global_batch = args.per_device_batch * data_par
    rng = np.random.default_rng(0)
    host_batch = _host_batch(cfg, global_batch, rng)

    # init example: post-preprocess dtypes (bench.py's contract — the uint8
    # normalize+augment runs compiled inside the step, not at init)
    h, w = cfg.data.image_size_h, cfg.data.image_size_w
    init_example = {
        k: (np.zeros((global_batch, h, w, 1), np.float32)
            if k in ("images", "image_views") else v)
        for k, v in host_batch.items()
    }
    init_example = ctx.shard_host_batch(init_example)
    state = shard_train_state(
        create_train_state(model, init_example, tx, jax.random.PRNGKey(0)),
        ctx.mesh, fsdp=args.fsdp)

    k = args.steps_per_call
    if k > 1:
        host_batch = {key: np.stack([v] * k) for key, v in host_batch.items()}
    batch = ctx.shard_host_batch(host_batch, stacked=(k > 1))

    step_rng = jax.random.PRNGKey(1)
    import contextlib

    with contextlib.ExitStack() as stack:
        if getattr(args, "seq_parallel", False):
            # SP constraints read the abstract mesh at trace time — the first
            # train_step call below traces under this active mesh context
            stack.enter_context(jax.set_mesh(ctx.mesh))
        for _ in range(WARMUP_GROUPS):
            state, loss_dict = train_step(state, batch, step_rng)
            warm_loss = float(loss_dict["total"])
        assert np.isfinite(warm_loss), f"non-finite loss on {n_devices}-device mesh"

        times = []
        for _ in range(max(1, args.measure_steps // GROUP)):
            t0 = time.perf_counter()
            for _ in range(GROUP):
                state, loss_dict = train_step(state, batch, step_rng)
            _ = float(loss_dict["total"])  # forces completion of the whole group
            times.append((time.perf_counter() - t0) / (GROUP * k))
    median = sorted(times)[len(times) // 2]

    imgs = 2 * global_batch / median  # 2 views/sample, bench.py's counter
    return {
        "n_devices": n_devices,
        "mesh": dict(ctx.mesh.shape),
        "seq_parallel": bool(getattr(args, "seq_parallel", False) and tp > 1),
        "global_batch": global_batch,
        "ms_per_step": round(median * 1e3, 2),
        "images_per_sec_total": round(imgs, 2),
        "images_per_sec_per_chip": round(imgs / n_devices, 2),
        "warm_loss": round(warm_loss, 4),
    }


def main(argv=None) -> list:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--mesh-sizes", default="1,2,4,8",
                    help="comma-separated device counts to sweep")
    ap.add_argument("--recipe", choices=["flagship", "compat", "tiny"],
                    default="flagship")
    ap.add_argument("--per-device-batch", type=int, default=8,
                    help="weak scaling: global batch = this x data-parallel size")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ('model' axis) size; mesh sizes not "
                    "divisible by it fall back to tp=1")
    ap.add_argument("--replica", type=int, default=1,
                    help="cross-slice DCN axis size (multislice pods)")
    ap.add_argument("--steps-per-call", type=int, default=5,
                    help="fused K-step call width (bench.py ships K=5)")
    ap.add_argument("--measure-steps", type=int, default=10)
    ap.add_argument("--no-fsdp", dest="fsdp", action="store_false",
                    help="replicate params instead of ZeRO-3 sharding them")
    ap.add_argument("--seq-parallel", action="store_true",
                    help="with --tp > 1: Megatron-SP sequence sharding of the "
                    "text tower's LN/dropout/residual regions over the 'model' "
                    "axis (parallel/constraint.shard_seq, r5); a no-op at tp=1")
    ap.add_argument("--selftest", action="store_true",
                    help="tiny config on the virtual CPU mesh: certifies the "
                    "harness end-to-end on this 1-chip pod")
    args = ap.parse_args(argv)

    sizes = sorted({int(s) for s in args.mesh_sizes.split(",")})
    if args.selftest:
        # pin the virtual CPU mesh BEFORE any jax op (this pod's sitecustomize
        # force-registers the remote TPU backend; mirrors dryrun_multichip)
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(sizes + [8])}"
            ).strip()
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", max(sizes + [8]))
        except RuntimeError:
            # backends already initialized (in-pytest use: conftest.py pinned
            # the 8-device CPU mesh before we got here) — nothing to do
            pass
        args.recipe = "tiny"
        args.per_device_batch = min(args.per_device_batch, 2)

    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from mammo_clip_tpu.core.config import tiny_test_config
    from mammo_clip_tpu.train.recipes import bench_recipe_config

    if args.recipe == "tiny":
        cfg = tiny_test_config()
    else:
        cfg = bench_recipe_config(compat=(args.recipe == "compat"))
    if args.recipe == "compat":
        args.steps_per_call = 1  # reference-exact dispatch semantics

    avail = len(jax.devices())
    platform = jax.devices()[0].platform
    results = []
    for n in sizes:
        if n > avail:
            print(f"skipping {n}-device mesh: only {avail} {platform} devices",
                  file=sys.stderr)
            continue
        r = _measure_mesh(cfg, n, args)
        r["platform"] = platform
        print(json.dumps(r))
        results.append(r)

    assert results, "no mesh size fit the available devices"
    base = results[0]
    summary = {
        "metric": f"weak_scaling_{args.recipe}_{platform}",
        "per_device_batch": args.per_device_batch,
        "steps_per_call": args.steps_per_call,
        "baseline_n": base["n_devices"],
        "efficiency": {
            str(r["n_devices"]): round(
                r["images_per_sec_per_chip"] / base["images_per_sec_per_chip"], 3)
            for r in results
        },
    }
    print(json.dumps(summary))
    return results


if __name__ == "__main__":
    main()
