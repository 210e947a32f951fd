"""Param/FLOP accounting: flagship `tpu_optimized` recipe vs reference-exact B5.

Quantifies the capacity delta behind the bench's flagship number (VERDICT r2 #1):
the flagship replaces stem + stages 1-2 with a space-to-depth front end, so its
parameter count and forward FLOPs differ from the checkpoint-compatible B5.
Prints a table; results are recorded in BASELINE.md.

Run on the CPU backend (no TPU needed):
    PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/count_params_flops.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mammo_clip_tpu.models.efficientnet import EfficientNet

    H, W = 1520, 912

    def analyze(name, **kwargs):
        model = EfficientNet(variant="b5", in_channels=1, dtype=jnp.bfloat16,
                             **kwargs)
        import numpy as np

        x = jnp.zeros((1, H, W, 1), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(variables["params"]))

        def fwd(v, x):
            return model.apply(v, x, train=False)["pooled"]

        lowered = jax.jit(fwd).lower(
            variables, jax.ShapeDtypeStruct(x.shape, x.dtype))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        print(f"{name:32s} params {n_params/1e6:8.2f} M   fwd {flops/1e9:8.1f} GFLOP")
        return n_params, flops

    print(f"image tower @ {H}x{W}, bs=1, bf16 activations", file=sys.stderr)
    base = analyze("reference-exact B5")
    r2 = analyze("flagship r2 (s2d front e2)", tpu_optimized=True,
                 tpu_dense_widths=False, tpu_front_expand=2)
    r3w = analyze("r3 +dense widths (front e2)", tpu_optimized=True,
                  tpu_front_expand=2)
    flag = analyze("flagship r3 (dense, front e1)", tpu_optimized=True)
    slim35 = analyze("r3 promoted (slim3+5)", tpu_optimized=True,
                     tpu_slim_stage3=256, tpu_slim_stage5=768)
    promoted = analyze("promoted recipe (slim3+5+6+4)", tpu_optimized=True,
                       tpu_slim_stage3=256, tpu_slim_stage5=768,
                       tpu_slim_stage6=1536, tpu_slim_stage4=512)
    slim7 = analyze("promoted + slim7=2048", tpu_optimized=True,
                    tpu_slim_stage3=256, tpu_slim_stage5=768,
                    tpu_slim_stage6=1536, tpu_slim_stage4=512,
                    tpu_slim_stage7=2048)
    negctl = analyze("negative control (slim3=128,5=384)", tpu_optimized=True,
                     tpu_slim_stage3=128, tpu_slim_stage5=384)
    extreme = analyze("extreme control (128/256/512/256)", tpu_optimized=True,
                      tpu_slim_stage3=128, tpu_slim_stage5=256,
                      tpu_slim_stage6=512, tpu_slim_stage4=256)
    for name, row in (("r2 / compat", r2), ("r3-e2 / compat", r3w),
                      ("r3 / compat", flag), ("slim3+5 / compat", slim35),
                      ("promoted / compat", promoted),
                      ("promoted+slim7 / compat", slim7),
                      ("neg-control / compat", negctl),
                      ("extreme-control / compat", extreme)):
        print(f"{name:32s} params {row[0]/base[0]:8.3f}     "
              f"fwd {row[1]/base[1]:8.3f}")


if __name__ == "__main__":
    main()
