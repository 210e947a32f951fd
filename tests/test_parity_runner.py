"""The staged real-data parity runner's dry run (VERDICT r3 #6): the whole
pipeline — byte-accurate fake public .tar -> zero-shot rows (+ the report
formatting) — must produce finite metrics with zero real data, proving the
real run is only path edits away. The lp/det rows ride the same CLI mains
already covered by tests/test_cli_drivers.py; the standalone
`python parity/run_parity.py --selftest` exercises them too."""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_parity_selftest_zeroshot_rows(tmp_path, capsys):
    from parity import run_parity

    out = str(tmp_path / "parity.json")
    run_parity.main(["--selftest", "--skip-lp", "--skip-det", "--out", out])
    with open(out) as f:
        payload = json.load(f)
    rows = {r["row"]: r for r in payload["rows"]}
    assert {"zs_vindr/mass", "zs_vindr/suspicious_calcification",
            "zs_rsna/malignancy"} <= set(rows)
    assert all(np.isfinite(r["ours"]) for r in rows.values())
    # expected slots ship unscored until the paper numbers are reachable
    assert payload["verdict"].startswith("UNSCORED")
    assert payload["gate_auc_points"] == 0.5
