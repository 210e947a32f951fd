"""Offline text pipeline + VinDr CSV builder tests."""

import numpy as np
import pandas as pd

from mammo_clip_tpu.preprocess.text import (
    BackTranslator,
    assign_group_folds,
    augment_pretrain_csv,
    build_pretrain_rows,
    clean_report_segment,
)
from mammo_clip_tpu.preprocess.vindr_csv import build_vindr_clip_csv, rescale_detection_boxes


def test_clean_report_segment():
    raw = "FINDINGS:  There is a MASS.   Ok. Café report with ’weird’ chars here."
    out = clean_report_segment(raw)
    assert out == out.lower()
    assert "café" not in out
    assert "ok." not in out  # short sentence dropped
    assert "mass" in out


def test_assign_group_folds_consistent_per_patient():
    df = pd.DataFrame({"patient_id": ["a", "a", "b", "c", "d", "d"], "x": range(6)})
    out = assign_group_folds(df, n_folds=2, seed=1)
    per_patient = out.groupby("patient_id")["fold"].nunique()
    assert (per_patient == 1).all()
    assert set(out["fold"]) <= {0, 1}


def test_build_pretrain_rows_schema():
    df = pd.DataFrame(
        {
            "patient_id": ["p", "p", "p"],
            "laterality": ["L", "L", "L"],
            "image_id": ["a", "b", "c"],
            "view": ["CC", "MLO", "MLO"],
            "findings": ["there is a mass present here."] * 3,
            "impressions": ["benign impression overall noted."] * 3,
        }
    )
    rows = build_pretrain_rows(df)
    assert len(rows) == 1
    r = rows.iloc[0]
    assert r["CC"] == ["a"] and sorted(r["MLO"]) == ["b", "c"]
    assert len(r["text"]) == 2
    assert r["view"] == ["CC", "MLO"]


def test_backtranslation_gated_identity():
    bt = BackTranslator()
    # offline: degrades to identity
    if not bt.available:
        assert bt("some text") == "some text"
    df = pd.DataFrame({"text": [["alpha beta gamma."]]})
    out = augment_pretrain_csv(df, bt)
    assert "text_augment" in out.columns
    assert isinstance(out["text_augment"].iloc[0], list)


def test_build_vindr_clip_csv():
    ann = pd.DataFrame(
        {
            "study_id": ["s1", "s1", "s2"],
            "laterality": ["R", "R", "L"],
            "image_id": ["i1", "i2", "i3"],
            "view_position": ["CC", "MLO", "CC"],
            "finding_categories": [["Mass"], ["Mass", "Skin Thickening"], ["No Finding"]],
            "split": ["training", "training", "test"],
        }
    )
    out = build_vindr_clip_csv(ann)
    assert len(out) == 2
    r1 = out[out.patient_id == "s1"].iloc[0]
    assert r1["CC"] == ["i1"] and r1["MLO"] == ["i2"]
    pos_right = r1["CC_FINDING"][0]
    assert "Mass" in pos_right and r1["CC_FINDING"][1] == []  # laterality R
    neg_right = r1["CC_FINDING"][2]
    assert "Mass" not in neg_right and "Suspicious Calcification" in neg_right
    r2 = out[out.patient_id == "s2"].iloc[0]
    assert r2["CC_FINDING"][1] == ["No Finding"]  # left positive

    # the rows are consumable by the pretraining dataset
    from mammo_clip_tpu.data.datasets import ImageTextDataset
    from mammo_clip_tpu.data.images import SyntheticImageStore

    ds = ImageTextDataset(out, SyntheticImageStore((16, 16)), split="valid")
    item = ds[0]
    assert isinstance(item["text"], str) and item["text"]


def test_rescale_detection_boxes():
    ann = pd.DataFrame(
        {"image_id": ["a"], "xmin": [100.0], "ymin": [200.0], "xmax": [300.0], "ymax": [400.0]}
    )
    bounds = pd.DataFrame({"image_id": ["a"], "y0": [100], "y1": [1100], "x0": [50], "x1": [550]})
    out = rescale_detection_boxes(ann, bounds, out_size=(2000, 1000))
    # x scale: 1000/500=2, y scale: 2000/1000=2
    assert out.resized_xmin.iloc[0] == (100 - 50) * 2
    assert out.resized_ymax.iloc[0] == (400 - 100) * 2


def test_rule_paraphraser_varies_but_preserves_labels():
    from mammo_clip_tpu.preprocess.text import RuleParaphraser, augment_pretrain_csv
    import pandas as pd

    texts = [
        "there is no evidence of mass. the breast is unremarkable. "
        "scattered calcifications are seen in the left breast.",
        "a spiculated mass is noted in the upper outer quadrant. "
        "no suspicious calcification is identified.",
    ]
    pp = RuleParaphraser(seed=0)
    changed = 0
    for t in texts:
        out = pp(t)
        assert out == pp(t)  # deterministic
        changed += out != t
        # label-bearing clinical nouns are preserved verbatim
        for noun in ("mass", "calcification"):
            assert (noun in t) == (noun in out)
    assert changed >= 1  # the augmentation carries real signal

    df = pd.DataFrame({"text": [texts]})
    out_df = augment_pretrain_csv(df)
    aug = out_df["text_augment"].iloc[0]
    assert isinstance(aug, list) and len(aug) == 2
    assert any(a != t for a, t in zip(aug, texts))
