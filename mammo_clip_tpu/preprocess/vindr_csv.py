"""VinDr metadata builders.

Replaces the reference's preprocess-clip notebook (reference:
notebooks/preprocess-clip/VinDr.ipynb cells 4-18) and the detector bbox-rescale
script (preprocess_VinDr_detector.py:61-126):

* ``build_vindr_clip_csv``: finding_annotations.csv -> per (study, laterality) rows
  with CC/MLO image lists and ``[[+right], [+left], [-right], [-left]]`` finding
  lists (the image-label pretraining schema consumed by ImageTextDataset);
* ``rescale_detection_boxes``: remap GT boxes through the stored crop bounds into the
  resized frame (resized_{x,y}{min,max} columns).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pandas as pd

from ..data.prompts import VINDR_FINDINGS
from .breast_crop import remap_boxes


def _findings_of(group: pd.DataFrame) -> List[str]:
    cats: List[str] = []
    for v in group.get("finding_categories", []):
        vals = v if isinstance(v, list) else [v]
        for c in vals:
            if c in VINDR_FINDINGS and c not in cats:
                cats.append(c)
    return cats or ["No Finding"]


def build_vindr_clip_csv(annotations: pd.DataFrame) -> pd.DataFrame:
    """finding_annotations-style rows -> image-label pretraining rows."""
    rows = []
    for (study, lat), g in annotations.groupby(["study_id", "laterality"]):
        views: Dict[str, List[str]] = {"CC": [], "MLO": []}
        view_findings: Dict[str, List[str]] = {}
        for view in ("CC", "MLO"):
            sub = g[g["view_position"] == view]
            views[view] = sub["image_id"].astype(str).unique().tolist()
            view_findings[view] = _findings_of(sub) if len(sub) else ["No Finding"]
        present = [v for v in ("CC", "MLO") if views[v]]
        if not present:
            continue
        other = "L" if lat == "R" else "R"

        def finding_struct(view: str) -> List[List[str]]:
            pos = view_findings.get(view, ["No Finding"])
            pos_wo_nf = [f for f in pos if f != "No Finding"]
            neg = [f for f in VINDR_FINDINGS if f not in pos and f != "No Finding"]
            right = pos if lat == "R" else []
            left = pos if lat == "L" else []
            neg_right = neg if lat == "R" else []
            neg_left = neg if lat == "L" else []
            return [right, left, neg_right, neg_left]

        rows.append(
            {
                "patient_id": study,
                "laterality": lat,
                "image": [i for v in present for i in views[v]],
                "view": present,
                "CC": views["CC"],
                "MLO": views["MLO"],
                "CC_FINDING": finding_struct("CC"),
                "MLO_FINDING": finding_struct("MLO"),
                "split": g["split"].iloc[0] if "split" in g else "training",
            }
        )
    return pd.DataFrame(rows)


def rescale_detection_boxes(
    annotations: pd.DataFrame,
    bounds: pd.DataFrame,  # image_id, y0, y1, x0, x1 from the DICOM tool
    out_size=(1520, 912),
) -> pd.DataFrame:
    """Add resized_{x,y}{min,max} columns by replaying crop+resize per image."""
    bmap = {str(r.image_id): (int(r.y0), int(r.y1), int(r.x0), int(r.x1))
            for r in bounds.itertuples()}
    out = annotations.copy()
    cols = np.zeros((len(out), 4), np.float32)
    for i, r in enumerate(out.itertuples()):
        b = bmap.get(str(r.image_id))
        box = np.asarray([[r.xmin, r.ymin, r.xmax, r.ymax]], np.float32)
        if b is None or np.any(np.isnan(box)):
            cols[i] = box[0]
            continue
        cols[i] = remap_boxes(box, b, out_size)[0]
    out["resized_xmin"], out["resized_ymin"] = cols[:, 0], cols[:, 1]
    out["resized_xmax"], out["resized_ymax"] = cols[:, 2], cols[:, 3]
    return out
