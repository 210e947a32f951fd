"""Capture a device trace for a workload and print the top ops by self time.

The relay TPU supports jax.profiler tracing; the resulting .xplane.pb is parsed
directly (XSpace -> device plane -> XLA op events) so no TensorBoard UI is
needed on this headless pod.

Usage:
  python benchmarks/profile_op.py --workload e1_fused|e1_nhwc|e6_fused|e6_nhwc|step
                                  [--views 16] [--top 30] [--iters 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_xspace(logdir: str, top: int):
    """hlo_stats via the xprof converter: top HLO ops by self time."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print(json.dumps({"error": "no xplane.pb captured"}))
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(paths, key=os.path.getmtime)], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # hlo_stats: gviz-style table {cols: [...], rows: [{c: [{v: ...}, ...]}]}
    cols = [c.get("label") or c.get("id") for c in obj.get("cols", [])]
    rows = []
    for rr in obj.get("rows", []):
        vals = [c.get("v") if isinstance(c, dict) else c for c in rr.get("c", [])]
        rows.append(dict(zip(cols, vals)))
    if not rows:
        print(json.dumps(obj)[:2000])
        return

    def col(row, *names, default=0.0):
        for n in names:
            for key, val in row.items():
                if key and n in key.lower():
                    return val
        return default

    rows.sort(key=lambda r: -float(col(r, "total self time (us)", "self time")
                                   or 0.0))
    total = sum(float(col(r, "total self time (us)", "self time") or 0.0)
                for r in rows)
    print(f"== hlo_stats: {len(rows)} ops, total self time "
          f"{total / 1e3:.2f} ms ==")
    print(f"{'ms':>9} {'%':>5}  {'cat':<22} name")
    for r in rows[:top]:
        ms = float(col(r, "total self time (us)", "self time") or 0.0) / 1e3
        cat = str(col(r, "category", default=""))[:22]
        name = str(col(r, "hlo op name", "op name", "expression",
                       default=""))[:110]
        print(f"{ms:9.2f} {100 * ms * 1e3 / max(total, 1e-9):5.1f}  "
              f"{cat:<22} {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="e1_fused")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mammo_clip_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    r = np.random.default_rng(0)

    def block_workload(expand, fused, c, h, w):
        from mammo_clip_tpu.models.efficientnet import BlockArgs, MBConvBlock

        N = args.views
        a = BlockArgs(kernel=3, stride=1, expand_ratio=expand, in_filters=c,
                      out_filters=c, se_ratio=0.25)
        valid_hw = ()
        if fused:
            from mammo_clip_tpu.ops.mbconv6_pallas import pick_h_pad, pick_w_pad

            wp = pick_w_pad(w)
            hp = pick_h_pad(h, c * expand, wp)
            if (hp, wp) != (h, w):
                valid_hw = (h, w)
                h, w = hp, wp
        block = MBConvBlock(a, drop_rate=0.0, dtype=jnp.bfloat16, fused_nchw=fused,
                            fused_valid_hw=valid_hw)
        if fused:
            x = jnp.asarray(r.standard_normal((N, c, h, w)), jnp.bfloat16)
            if valid_hw:  # zero-pad contract
                vh, vw = valid_hw
                mask = np.zeros((N, c, h, w), np.float32)
                mask[:, :, :vh, :vw] = 1.0
                x = x * jnp.asarray(mask, jnp.bfloat16)
        else:
            x = jnp.asarray(r.standard_normal((N, h, w, c)), jnp.bfloat16)
        w_out = jnp.asarray(r.standard_normal(x.shape) * 0.01, jnp.bfloat16)
        variables = block.init({"params": jax.random.PRNGKey(0)}, x, True)

        def loss(x, params, w_out):
            # w_out must be an ARGUMENT: closed-over arrays become giant dense
            # constants in the lowered module (538 MB at stage-1 shapes) and
            # blow the remote compile helper's request size limit
            out, _ = block.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum((out * w_out).astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(loss))
        return lambda: g(x, variables["params"], w_out)[0]

    def step_workload(fused: bool, batch: int = 8, tpu_opt: bool = False,
                      trimmed: bool = False):
        """The full B5 pretraining step exactly as bench.py runs it."""
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")
        from mammo_clip_tpu.core.config import default_pretrain_config
        from mammo_clip_tpu.losses import build_loss
        from mammo_clip_tpu.models import build_model
        from mammo_clip_tpu.ops.augment import AugmentConfig, augment_two_views
        from mammo_clip_tpu.train import (
            build_optimizer, create_train_state, make_train_step,
            warmup_cosine_sq_schedule,
        )

        cfg = default_pretrain_config("b5")
        cfg.model.image_encoder.remat = not tpu_opt
        cfg.model.image_encoder.fused_mbconv = fused
        cfg.model.image_encoder.tpu_optimized = tpu_opt
        if tpu_opt:
            # match bench.py's flagship recipe (r4: amp scores on, trims
            # demoted to --trimmed). Profiling stays at K=1 — the fused K=5
            # call scans the SAME body, and per-op attribution wants one
            # unrolled instance; dispatch amortization is invisible to the
            # device trace anyway.
            cfg.model.text_encoder.amp_attn_scores = True
        if trimmed:
            # the r3-promoted / r4-demoted capacity trims (bench.py --trimmed)
            cfg.model.image_encoder.tpu_slim_stage3 = 256
            cfg.model.image_encoder.tpu_slim_stage5 = 768
            cfg.model.image_encoder.tpu_slim_stage6 = 1536
            cfg.model.image_encoder.tpu_slim_stage4 = 512
        h, w = cfg.data.image_size_h, cfg.data.image_size_w
        seq = cfg.data.text_max_length
        model = build_model(cfg.model.to_dict(), dtype=jnp.bfloat16)
        loss_fn = build_loss(cfg.loss.to_dict())
        tx = build_optimizer(cfg.optimizer.to_dict(),
                             warmup_cosine_sq_schedule(cfg.optimizer.lr, 10_000, 500))
        aug = AugmentConfig.from_dict(cfg.augment.to_dict())
        mean, std = cfg.data.mean, cfg.data.std

        def preprocess(b, rng):
            b = dict(b)
            b["images"], b["image_views"] = augment_two_views(
                b["images"], b["image_views"], rng, aug, mean, std, train=True,
                out_dtype=jnp.bfloat16 if tpu_opt else None)
            return b

        ids = r.integers(1, cfg.model.text_encoder.vocab_size,
                         size=(batch, seq), dtype=np.int32)
        bt = {
            "images": jnp.asarray(r.integers(0, 255, (batch, h, w, 1), dtype=np.uint8)),
            "image_views": jnp.asarray(r.integers(0, 255, (batch, h, w, 1), dtype=np.uint8)),
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((batch, seq), jnp.int32),
            "input_ids2": jnp.asarray(ids),
            "attention_mask2": jnp.ones((batch, seq), jnp.int32),
        }
        init_ex = dict(bt)
        init_ex["images"] = jnp.zeros((batch, h, w, 1), jnp.float32)
        init_ex["image_views"] = jnp.zeros((batch, h, w, 1), jnp.float32)
        state = [create_train_state(model, init_ex, tx, jax.random.PRNGKey(0))]
        step = make_train_step(model, loss_fn, preprocess=preprocess, donate=True)
        rng_ = jax.random.PRNGKey(1)

        def run():
            state[0], ld = step(state[0], bt, rng_)
            return ld["total"]

        return run

    def bert_workload(amp_scores: bool, texts: int = 16, seq: int = 256):
        """Production-shape text tower alone (16 texts @ 256 tokens, bf16),
        fwd+bwd — the ledger's BERT bucket (22.3 ms at 1.99x its MXU floor)
        isolated so attention-layout probes compile in minutes, not the
        full-step 10-40 min."""
        from mammo_clip_tpu.models.bert import BertConfig, BertEncoder

        cfg = BertConfig(dropout_rate=0.0, amp_attn_scores=amp_scores)
        enc = BertEncoder(cfg, dtype=jnp.bfloat16)
        ids = jnp.asarray(
            r.integers(1, cfg.vocab_size, size=(texts, seq), dtype=np.int32))
        am = jnp.ones((texts, seq), jnp.int32)
        variables = enc.init(jax.random.PRNGKey(0), ids, am, deterministic=True)
        w_out = jnp.asarray(
            r.standard_normal((texts, seq, cfg.hidden_size)) * 0.01, jnp.bfloat16)

        def loss(params, w_out):
            h = enc.apply({"params": params}, ids, am, deterministic=True)
            return jnp.sum((h * w_out).astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(loss))
        return lambda: g(variables["params"], w_out)[0]

    if args.workload == "e1_fused":
        fn = block_workload(1, True, 24, 456, 760)
    elif args.workload == "e1_nhwc":
        fn = block_workload(1, False, 24, 456, 760)
    elif args.workload == "e6_fused":
        fn = block_workload(6, True, 40, 228, 380)
    elif args.workload == "e6_nhwc":
        fn = block_workload(6, False, 40, 228, 380)
    elif args.workload == "step":
        fn = step_workload(fused=False)
    elif args.workload == "step_fused":
        fn = step_workload(fused=True)
    elif args.workload == "step_tpu_native":
        fn = step_workload(fused=False, tpu_opt=True)
    elif args.workload == "step_tpu_trimmed":
        fn = step_workload(fused=False, tpu_opt=True, trimmed=True)
    elif args.workload == "bert":
        fn = bert_workload(amp_scores=False)
    elif args.workload == "bert_amp":
        fn = bert_workload(amp_scores=True)
    else:
        raise SystemExit(f"unknown workload {args.workload}")

    # compile + settle
    l = float(fn())
    print(f"warm loss {l:.4f}", file=sys.stderr)

    logdir = args.logdir or tempfile.mkdtemp(prefix="xprof_")
    import time
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        l = fn()
    l = float(l)
    wall = (time.perf_counter() - t0) * 1e3
    jax.profiler.stop_trace()
    print(f"wall for {args.iters} iters: {wall:.1f} ms", file=sys.stderr)
    _parse_xspace(logdir, args.top)


if __name__ == "__main__":
    main()
