"""Render real_scale_learning arm logs into the BASELINE.md table format.

Usage: python benchmarks/arm_report.py outputs/arm_r4_*.jsonl [--every 500]

Each arm's JSONL (one line per eval) becomes one row group: loss + macro
zero-shot AUROC (+ low-contrast bucket accuracy for the graded 'shapes'
task) at the requested step milestones, plus steps-to-bar summaries.
"""

from __future__ import annotations

import argparse
import json


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                rows.append(json.loads(line))
    return rows


def first_step_at(rows, key, bar):
    for r in rows:
        if r.get(key, 0.0) >= bar:
            return r["step"]
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--every", type=int, default=500)
    ap.add_argument("--bar", type=float, default=0.85,
                    help="macro-AUROC bar for the steps-to-bar column")
    args = ap.parse_args()

    arms = {}
    for path in args.logs:
        rows = load(path)
        if rows:
            arms[rows[0]["path"]] = rows

    milestones = sorted({r["step"] for rows in arms.values() for r in rows
                         if r["step"] % args.every == 0 or
                         r["step"] == max(x["step"] for x in rows)})
    print("| arm | " + " | ".join(f"@{s}" for s in milestones)
          + f" | last-3 mean | steps to macro>={args.bar} | final acc@20/35 |")
    print("|---|" + "---|" * (len(milestones) + 3))
    for name, rows in arms.items():
        by_step = {r["step"]: r for r in rows}
        cells = []
        for s in milestones:
            r = by_step.get(s)
            cells.append("—" if r is None
                         else f"{r['loss']:.2f} / {r['auroc']:.3f}")
        tta = first_step_at(rows, "auroc", args.bar)
        last = rows[-1]
        # single-eval endpoints are noisy (128 held-out images): also report
        # the mean of the last 3 evals so arms aren't ranked on one draw
        tail = rows[-3:]
        tail_mean = sum(r["auroc"] for r in tail) / len(tail)
        amp = last.get("acc_amp", {})
        lo = (f"{amp.get('20', float('nan')):.2f}/{amp.get('35', float('nan')):.2f}"
              if amp else "—")
        print(f"| {name} | " + " | ".join(cells)
              + f" | {tail_mean:.3f}"
              + f" | {tta if tta is not None else '>' + str(last['step'])} | {lo} |")


if __name__ == "__main__":
    main()
