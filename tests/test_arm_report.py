"""arm_report renders the BASELINE.md graded-gate tables — keep its noise
arithmetic (the Hanley-McNeil eval-SE floor that the r4 demotion verdict
leans on) and its log parsing green."""

import io
import contextlib
import json
import math
import sys


def test_hanley_mcneil_se_reference_values():
    from benchmarks.arm_report import hanley_mcneil_se, macro_se

    # Hanley & McNeil 1982 eq. 2 at the graded-gate operating point:
    # AUROC 0.95, 32 pos / 96 neg -> SE ~0.027 (the number quoted in the
    # BASELINE r4 noise-floor paragraph derives from this)
    se = hanley_mcneil_se(0.95, 32, 96)
    assert 0.020 < se < 0.035
    # degenerate AUROC=1.0 must not produce NaN/negative variance
    assert hanley_mcneil_se(1.0, 32, 96) >= 0.0
    # SE shrinks with n: 4x the holdout roughly halves it
    assert hanley_mcneil_se(0.95, 128, 384) < se / 1.7
    # macro over k perfectly-discriminating classes is finite and smaller
    # than a single mid-range class SE
    m = macro_se([1.0, 0.9, 0.8, 1.0], 128)
    assert 0.0 < m < hanley_mcneil_se(0.8, 32, 96)
    # independence approximation: macro of k equal classes = se/sqrt(k)
    m_eq = macro_se([0.9] * 4, 128)
    assert math.isclose(m_eq, hanley_mcneil_se(0.9, 32, 96) / 2, rel_tol=1e-9)


def test_arm_report_renders_rows(tmp_path, monkeypatch):
    import benchmarks.arm_report as ar

    rows = [
        {"path": "armA", "step": s, "loss": 4.0 - s / 1000, "auroc": a,
         "auroc_cls": [1.0, a, a, 1.0],
         "acc": 0.5, "acc_amp": {"20": 0.5, "35": None, "60": 0.6, "90": 1.0}}
        for s, a in [(100, 0.6), (500, 0.8), (1000, 0.88), (1500, 0.9),
                     (2000, 0.92)]
    ]
    log = tmp_path / "armA.jsonl"
    # interleave non-JSON chatter: the parser must skip it (real logs carry
    # jax warnings and checkpoint notices on stdout)
    with open(log, "w") as f:
        f.write("WARNING: Platform 'axon' is experimental\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
            f.write("[armA] checkpointed step -> /tmp/x\n")

    monkeypatch.setattr(sys, "argv", ["arm_report", str(log), "--every", "500"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ar.main()
    out = buf.getvalue()
    assert "| armA |" in out
    # milestone cells at 500/1000/1500/2000, loss/auroc formatting
    assert "3.50 / 0.800" in out and "2.00 / 0.920" in out
    # last-3 mean of 0.88/0.90/0.92 with the analytic SE attached
    assert "0.900 ±0." in out
    # steps-to-bar: first eval with macro >= 0.85 is step 1000
    assert "| 1000 |" in out
    # null acc_amp bucket renders as nan, not a crash
    assert "0.50/nan" in out
