"""The roofline ledger is a decision document (BASELINE.md r4 'declared
ceiling') — keep its arithmetic and its coupling to the real block specs
green."""

import io
import contextlib


def test_block_args_promoted_recipe_shapes():
    from mammo_clip_tpu.models.efficientnet import tpu_optimized_block_args

    args, skip = tpu_optimized_block_args(
        "b5", slim_stage3=256, slim_stage5=768, slim_stage6=1536,
        slim_stage4=512)
    assert skip == 8 and len(args) == 31  # b5 deep stages 3..7 = 5+7+7+9+3
    # entry block rewired to the s2d front's width
    assert args[0].in_filters == 128 and args[0].stride == 2
    # every width lane-dense (128-multiples) under the dense remap
    assert all(a.in_filters % 128 == 0 and a.out_filters % 128 == 0
               and a.expanded % 128 == 0 for a in args)
    # the slim targets actually landed
    assert {a.expanded for a in args if a.kernel == 5} <= {256, 768, 1536, 512, 384}
    assert any(a.expanded == 1536 for a in args)          # stage6 trim
    assert any(a.expanded == 512 for a in args if a.kernel == 3)  # stage4 trim


def test_ledger_runs_and_floor_is_consistent():
    import benchmarks.roofline_ledger as rl

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rl.main()
    out = buf.getvalue()
    assert "TOTAL" in out and "ceiling @ 100%" in out
    # the declared floor must stay in the documented ballpark; a drift means
    # the byte model or the block specs changed — re-derive BASELINE.md r4
    total_line = [ln for ln in out.splitlines() if ln.startswith("TOTAL")][0]
    floor_ms = float(total_line.split()[1])
    assert 100.0 < floor_ms < 150.0, total_line
