"""Aggregate a captured xplane trace into per-component self times.

Buckets hlo_stats rows by the JAX scope path recorded in the op metadata
("HLO Op Expression" / "Op Name" columns carry e.g.
``jit(step)/.../image_encoder/block_12/...``), giving the
stage-by-stage tables BASELINE.md records.

Usage:
  python benchmarks/profile_op.py --workload step_tpu_native --logdir /tmp/xp
  python benchmarks/component_profile.py --logdir /tmp/xp [--iters 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import heapq
import json
import os
import re


# B5 block index -> stage (stages 1..7 per the EfficientNet paper numbering);
# block numbering is the ORIGINAL one (tpu_optimized keeps deep-block names)
_B5_STAGE_START = {1: 0, 2: 3, 3: 8, 4: 13, 5: 20, 6: 27, 7: 36}


def _stage_of_block(idx: int) -> int:
    stage = 1
    for s, start in _B5_STAGE_START.items():
        if idx >= start:
            stage = s
    return stage


def classify(op_name: str) -> str:
    """Map a JAX metadata path to a component bucket."""
    n = op_name
    m = re.search(r"(?:tpu_front_block_\d+|tpu_stem)", n)
    if m:
        return "s2d_front"
    m = re.search(r"block_(\d+)", n)
    if m and "image_encoder" in n:
        return f"stage{_stage_of_block(int(m.group(1)))}"
    if "text_encoder" in n:
        return "bert"
    if "head_conv" in n or "head_bn" in n:
        return "head"
    if "stem" in n:
        return "stem"
    if any(k in n for k in ("warp", "augment", "standardize", "elastic", "affine")):
        return "augmentation"
    if any(k in n for k in ("projection", "logit", "loss", "softmax", "log_softmax")):
        return "loss/proj"
    if any(k in n for k in ("adam", "opt", "ema", "scale_by")):
        return "optimizer"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dump-cols", action="store_true")
    ap.add_argument("--top-other", type=int, default=15,
                    help="print the biggest 'other' rows for reclassification")
    ap.add_argument("--top-bucket", nargs="*", default=["other"],
                    help="buckets whose biggest rows to print (r4: pass "
                    "'other optimizer loss/proj bert' to attribute the "
                    "ledger's two probe surfaces op by op)")
    args = ap.parse_args()

    paths = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {args.logdir}"
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [max(paths, key=os.path.getmtime)], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in obj.get("cols", [])]
    if args.dump_cols:
        print(cols)
    rows = []
    for rr in obj.get("rows", []):
        vals = [c.get("v") if isinstance(c, dict) else c for c in rr.get("c", [])]
        rows.append(dict(zip(cols, vals)))

    def col(row, *names, default=None):
        for n in names:
            for key, val in row.items():
                if key and n in key.lower():
                    return val
        return default

    buckets = collections.Counter()
    hbm_us = collections.Counter()
    bw_weighted = collections.Counter()
    examples = collections.defaultdict(list)
    total = 0.0
    for r in rows:
        us = float(col(r, "total self time (us)", "self time") or 0.0)
        if us <= 0:
            continue
        # "Framework op name" carries the full JAX scope path
        # (jit(step)/.../image_encoder/block_12/...)
        name = str(col(r, "framework op name") or "")
        b = classify(name)
        buckets[b] += us
        total += us
        if str(col(r, "bound by") or "") == "HBM":
            hbm_us[b] += us
        bw = float(col(r, "measured memory bw") or 0.0)
        bw_weighted[b] += bw * us
        hlo = str(col(r, "hlo op name", "op name") or "")
        # keep only the rows that can make the printed top-N (op tables run
        # to 10^5 rows; a bounded heap avoids holding/sorting them all)
        heap = examples[b]
        item = (us, name[:160], hlo[:80])
        if len(heap) < args.top_other:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    per_iter = {k: round(v / 1e3 / args.iters, 1) for k, v in buckets.items()}
    print(json.dumps({"total_ms_per_iter": round(total / 1e3 / args.iters, 1),
                      "components": dict(sorted(per_iter.items(),
                                                key=lambda kv: -kv[1])),
                      "hbm_bound_frac": {k: round(hbm_us[k] / v, 2)
                                         for k, v in buckets.items()},
                      "avg_bw_gibs": {k: round(bw_weighted[k] / v, 0)
                                      for k, v in buckets.items()}}))
    for bucket in args.top_bucket:
        if bucket not in buckets:
            continue
        print(f"\n-- biggest '{bucket}' rows --")
        for us, name, hlo in sorted(examples[bucket], reverse=True):
            print(f"{us / 1e3 / args.iters:8.2f} ms  {hlo:40s}  {name}")


if __name__ == "__main__":
    main()
