"""Every production CLI main() driven end-to-end against one tiny pretrained
checkpoint — the argv-level analogue of the reference's entry points
(eval_zero_shot_clip.py, train_classifier.py, train_detector.py, validator.py,
Mammo-Factor notebook; SURVEY.md §2.1). test_cli_smoke.py covers pretrain +
dicom_tool; this module covers the consumers of its checkpoint."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from tests.test_cli_smoke import _write_pretrain_csv


@pytest.fixture(scope="module")
def clip_workdir(tmp_path_factory):
    """One tiny pretrain run (1 epoch, synthetic images) shared by every CLI test:
    returns a workdir with checkpoints/, best/, and config.yaml."""
    from mammo_clip_tpu.cli import pretrain
    from mammo_clip_tpu.core.config import tiny_test_config

    root = tmp_path_factory.mktemp("clip")
    csv = str(root / "pretrain.csv")
    _write_pretrain_csv(csv, n=32)
    cfg = tiny_test_config()
    cfg.scheduler.update(epochs=1, warmup_epochs=0)
    cfg.data["train"] = [{"csv": csv, "image_dir": "synthetic://", "data_type": "imagetext"}]
    cfg.data["valid"] = [{"csv": csv, "image_dir": "synthetic://", "data_type": "imagetext"}]
    cfg.data.batch_size_per_device = 1
    cfg_path = str(root / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    workdir = str(root / "run")
    pretrain.main(["--config", cfg_path, "--workdir", workdir])
    return workdir


@pytest.mark.slow
def test_zeroshot_cli(clip_workdir, tmp_path, capsys):
    from mammo_clip_tpu.cli import zeroshot

    rng = np.random.default_rng(0)
    rows = [{
        "patient_id": f"p{i}", "image_id": f"im{i}",
        "Mass": int(rng.integers(0, 2)),
        "Suspicious_Calcification": int(rng.integers(0, 2)),
        "split": "test",
    } for i in range(12)]
    # both classes present for AUROC
    rows[0]["Mass"], rows[1]["Mass"] = 0, 1
    rows[0]["Suspicious_Calcification"], rows[1]["Suspicious_Calcification"] = 0, 1
    csv = str(tmp_path / "zs.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = str(tmp_path / "res.json")

    zeroshot.main(["--checkpoint", os.path.join(clip_workdir, "best"),
                   "--csv", csv, "--image-dir", "synthetic://",
                   "--dataset", "vindr", "--split", "valid",
                   "--batch-size", "4", "--out", out])
    with open(out) as f:
        res = json.load(f)
    assert set(res) == {"mass", "suspicious_calcification"}
    assert all(0.0 <= v <= 1.0 for v in res.values())


@pytest.mark.slow
def test_retrieval_cli(clip_workdir, tmp_path, capsys):
    from mammo_clip_tpu.cli import retrieval

    rows = [{
        "patient_id": f"p{i}",
        "image": str([f"im{i}.png"]),
        "text": str([f"report number {i} with a unique finding {i}."]),
        "fold": 0,
    } for i in range(10)]
    csv = str(tmp_path / "ret.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    out = str(tmp_path / "res.json")

    retrieval.main(["--checkpoint", os.path.join(clip_workdir, "best"),
                    "--csv", csv, "--image-dir", "synthetic://",
                    "--batch-size", "4", "--out", out])
    with open(out) as f:
        res = json.load(f)
    i2t = res["retrieval_i2t"]
    recalls = [v for k, v in i2t.items() if k.startswith("Recall@")]
    assert recalls and all(0.0 <= v <= 1.0 for v in recalls)
    assert 1.0 <= i2t["MeanRank"] <= 10.0


@pytest.mark.slow
def test_validate_cli(clip_workdir, capsys):
    from mammo_clip_tpu.cli import validate

    validate.main(["--workdir", clip_workdir])
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(tail)
    assert "best_step" in res and res["losses"]
    assert all(np.isfinite(v) for v in res["losses"].values())


@pytest.mark.slow
def test_classifier_cli(clip_workdir, tmp_path, capsys):
    from mammo_clip_tpu.cli import classifier

    rows = [{
        "patient_id": f"p{i}", "image_id": f"im{i}", "laterality": "L",
        "cancer": int(i % 2), "fold": i % 3,
    } for i in range(24)]
    csv = str(tmp_path / "clf.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    classifier.main(["--clip-checkpoint", os.path.join(clip_workdir, "best"),
                     "--csv", csv, "--image-dir", "synthetic://",
                     "--label", "cancer", "--arch", "lp",
                     "--epochs", "1", "--batch-size", "4",
                     "--workdir", str(tmp_path / "clf_run")])
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(tail)
    assert np.isfinite(res["best_metric"]) and 0.0 <= res["best_metric"] <= 1.0
    assert os.path.isdir(str(tmp_path / "clf_run" / "best"))


@pytest.mark.slow
def test_detector_cli(clip_workdir, tmp_path, capsys):
    from mammo_clip_tpu.cli import detector

    rng = np.random.default_rng(2)
    rows = []
    for i in range(12):
        x0, y0 = rng.integers(2, 30, 2)
        rows.append({
            "study_id": f"s{i}", "image_id": f"im{i}",
            "finding_categories": str(["Mass"]),
            "resized_xmin": int(x0), "resized_ymin": int(y0),
            "resized_xmax": int(x0 + 20), "resized_ymax": int(y0 + 20),
            "split": "training" if i < 8 else "test",
        })
    csv = str(tmp_path / "det.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    detector.main(["--clip-checkpoint", os.path.join(clip_workdir, "best"),
                   "--csv", csv, "--image-dir", "synthetic://",
                   "--resize", "64", "--epochs", "1", "--batch-size", "4",
                   "--workdir", str(tmp_path / "det_run")])
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(tail)
    assert np.isfinite(res["best_mAP"])  # ~0 from 1 random-init epoch is fine
    assert os.path.isdir(str(tmp_path / "det_run" / "best"))


@pytest.mark.slow
def test_factor_cli(clip_workdir, tmp_path, capsys):
    from mammo_clip_tpu.cli import factor

    rows = [{
        "patient_id": f"p{i}", "image_id": f"im{i}",
        "Mass": 1 if i % 2 == 0 else 0,
        "Suspicious_Calcification": 1 if i % 2 else 0,
        "fold": 1,  # factor trains on the train split (fold != 0)
    } for i in range(16)]
    csv = str(tmp_path / "factor.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    factor.main(["--clip-checkpoint", os.path.join(clip_workdir, "best"),
                 "--csv", csv, "--image-dir", "synthetic://",
                 "--epochs", "1", "--batch-size", "4",
                 "--workdir", str(tmp_path / "factor_run")])
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(tail)
    assert np.isfinite(res["final_loss"])
    assert os.path.isdir(str(tmp_path / "factor_run" / "mapper"))
