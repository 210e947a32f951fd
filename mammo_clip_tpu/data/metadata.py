"""CSV metadata layer: schemas, dtype coercion, fold/split logic.

Mirrors the reference DataModule's dataframe handling
(reference: breastclip/data/datamodule.py:19-128):
* dtype coercions + fillna(0) on load (datamodule.py:33-41);
* split selection: VinDr-style datasets use the ``split`` column
  (training/test); fold-based datasets use ``fold != cur_fold`` for train and
  ``fold == cur_fold`` for valid (datamodule.py:59-64);
* list-typed columns (image/view/text/CC/MLO/*_FINDING) are stored as python-list
  strings in the CSVs (e.g. clip_pretrain_100.csv) and parsed here once, not per
  __getitem__ like the reference.
"""

from __future__ import annotations

import ast
from typing import Any, List, Optional

import pandas as pd

LIST_COLUMNS = [
    "image", "view", "CC", "MLO", "text", "text_augment",
    "CC_FINDING", "MLO_FINDING", "finding_categories",
]


def parse_list_cell(value: Any) -> List:
    """Parse a CSV cell that may hold a python-list literal or a scalar."""
    if isinstance(value, list):
        return value
    if isinstance(value, str):
        s = value.strip()
        if s.startswith("[") and s.endswith("]"):
            try:
                parsed = ast.literal_eval(s)
                return list(parsed) if isinstance(parsed, (list, tuple)) else [parsed]
            except (ValueError, SyntaxError):
                return [value]
        return [value]
    if pd.isna(value):
        return []
    return [value]


def load_metadata(path: str, parse_lists: bool = True) -> pd.DataFrame:
    df = pd.read_csv(path)
    # dtype coercion as in the reference (datamodule.py:33-41)
    for col in ("patient_id", "image_id", "study_id"):
        if col in df.columns:
            df[col] = df[col].astype(str)
    num_cols = df.select_dtypes(include="number").columns
    df[num_cols] = df[num_cols].fillna(0)
    if parse_lists:
        for col in LIST_COLUMNS:
            if col in df.columns:
                df[col] = df[col].map(parse_list_cell)
    return df


def split_dataframe(
    df: pd.DataFrame,
    split: str,
    cur_fold: int = 0,
) -> pd.DataFrame:
    """train/valid selection (reference datamodule.py:59-64).

    VinDr-style (has 'split' column): train <- split=='training', valid <- 'test'.
    Fold-style (has 'fold' column): train <- fold != cur_fold, valid <- fold == cur_fold.
    """
    assert split in ("train", "valid", "test")
    if "split" in df.columns:
        want = "training" if split == "train" else "test"
        out = df[df["split"] == want]
    elif "fold" in df.columns:
        out = df[df["fold"] != cur_fold] if split == "train" else df[df["fold"] == cur_fold]
    else:
        out = df
    return out.reset_index(drop=True)


def subsample(df: pd.DataFrame, data_frac: float, seed: int = 0) -> pd.DataFrame:
    """Reference's base.data_frac knob (datamodule.py uses df.sample)."""
    if data_frac >= 1.0:
        return df
    return df.sample(frac=data_frac, random_state=seed).reset_index(drop=True)
