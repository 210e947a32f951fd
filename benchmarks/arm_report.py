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


def hanley_mcneil_se(auc, n_pos, n_neg):
    """Analytic SE of one one-vs-rest AUROC (Hanley & McNeil 1982, eq. 2).

    Quantifies the eval-sampling noise floor of the graded gate: at 128
    held-out images (32 pos / 96 neg per class) a TRUE AUROC of 0.95
    measures with SE ~0.027 — so macro-AUROC differences of a few 0.01
    between arms are inside the instrument's own measurement noise even
    before seed-to-seed training variance is counted.
    """
    a = min(max(auc, 1e-6), 1 - 1e-6)
    q1 = a / (2 - a)
    q2 = 2 * a * a / (1 + a)
    var = (a * (1 - a) + (n_pos - 1) * (q1 - a * a)
           + (n_neg - 1) * (q2 - a * a)) / (n_pos * n_neg)
    return max(var, 0.0) ** 0.5


def macro_se(auroc_cls, holdout_n):
    """SE of the macro (mean) AUROC, treating the per-class one-vs-rest AUCs
    as independent (they share images, so this is a lower bound)."""
    k = len(auroc_cls)
    n_pos, n_neg = holdout_n // k, holdout_n - holdout_n // k
    var = sum(hanley_mcneil_se(a, n_pos, n_neg) ** 2 for a in auroc_cls)
    return var ** 0.5 / k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--every", type=int, default=500)
    ap.add_argument("--bar", type=float, default=0.85,
                    help="macro-AUROC bar for the steps-to-bar column")
    ap.add_argument("--holdout-n", type=int, default=128,
                    help="held-out eval set size (for the analytic SE column)")
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
          + f" | last-3 mean (±HM SE) | steps to macro>={args.bar} | final acc@20/35 |")
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
        # the mean of the last 3 evals so arms aren't ranked on one draw,
        # with the Hanley-McNeil analytic SE of ONE eval at the tail mean
        # (the 3 evals share the holdout, so averaging does not shrink the
        # sampling term the way independent draws would)
        tail = rows[-3:]
        tail_mean = sum(r["auroc"] for r in tail) / len(tail)
        se = (macro_se(last["auroc_cls"], args.holdout_n)
              if last.get("auroc_cls") else None)
        amp = last.get("acc_amp", {})
        # empty holdout buckets serialize as null (real_scale_learning r4)
        a20 = amp.get("20") if amp.get("20") is not None else float("nan")
        a35 = amp.get("35") if amp.get("35") is not None else float("nan")
        lo = f"{a20:.2f}/{a35:.2f}" if amp else "—"
        print(f"| {name} | " + " | ".join(cells)
              + f" | {tail_mean:.3f}" + (f" ±{se:.3f}" if se is not None else "")
              + f" | {tta if tta is not None else '>' + str(last['step'])} | {lo} |")


if __name__ == "__main__":
    main()
