"""Eval layer tests: metrics vs sklearn/reference formulas, retrieval ranks, zero-shot."""

import numpy as np
import pytest

from mammo_clip_tpu.eval.metrics import accuracy, auprc, auroc, pfbeta, pfbeta_binarized, pr_auc
from mammo_clip_tpu.eval.retrieval import eval_image_text_retrieval
from mammo_clip_tpu.eval.zeroshot import DEFAULT_ZS_PROMPTS, eval_zeroshot


def test_pfbeta_matches_reference_loop():
    """Vectorized pfbeta == the reference's per-element loop (evaluator.py:312-333)."""

    def reference_pfbeta(gt, pred, beta):
        y_true_count = ctp = cfp = 0
        for idx in range(len(gt)):
            prediction = min(max(pred[idx], 0), 1)
            if gt[idx]:
                y_true_count += 1
                ctp += prediction
            else:
                cfp += prediction
        beta2 = beta * beta
        c_precision = ctp / (ctp + cfp)
        c_recall = ctp / y_true_count
        if c_precision > 0 and c_recall > 0:
            return (1 + beta2) * c_precision * c_recall / (beta2 * c_precision + c_recall)
        return 0

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 2, 50)
    pred = rng.uniform(-0.1, 1.1, 50)
    np.testing.assert_allclose(pfbeta(gt, pred, 1.0), reference_pfbeta(gt, pred, 1.0), rtol=1e-9)
    np.testing.assert_allclose(pfbeta(gt, pred, 2.0), reference_pfbeta(gt, pred, 2.0), rtol=1e-9)


def test_pfbeta_binarized_sweep():
    gt = np.array([1, 0, 1, 0, 1])
    pred = np.array([0.9, 0.2, 0.8, 0.7, 0.4])
    v = pfbeta_binarized(gt, pred)
    assert 0.0 < v <= 1.0
    # perfect separation -> 1.0
    assert pfbeta_binarized(np.array([1, 1, 0, 0]), np.array([0.9, 0.8, 0.1, 0.2])) == 1.0


def test_basic_metrics():
    gt = np.array([0, 0, 1, 1])
    pred = np.array([0.1, 0.4, 0.35, 0.8])
    np.testing.assert_allclose(auroc(gt, pred), 0.75)
    assert 0 < auprc(gt, pred) <= 1
    assert 0 < pr_auc(gt, pred) <= 1
    assert accuracy(gt, (pred > 0.5).astype(int)) == 0.75


def test_retrieval_perfect_and_duplicate_texts():
    # 4 images, 3 unique texts (text of img 3 duplicates img 1's)
    d = 8
    rng = np.random.default_rng(1)
    t_emb = rng.standard_normal((3, d))
    t_emb /= np.linalg.norm(t_emb, axis=1, keepdims=True)
    texts = ["a", "b", "c", "b"]
    label = [0, 1, 2, 1]
    img = t_emb[label] + 0.01 * rng.standard_normal((4, d))
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    text_embeddings = np.stack([t_emb[0], t_emb[1], t_emb[2], t_emb[1]])
    res = eval_image_text_retrieval(img, text_embeddings, texts)["retrieval_i2t"]
    assert res["Recall@1"] == 1.0
    assert res["MeanRank"] == 1.0


def test_retrieval_ranks_are_sane():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((20, 16))
    txt = rng.standard_normal((20, 16))
    texts = [f"t{i}" for i in range(20)]
    res = eval_image_text_retrieval(img, txt, texts)["retrieval_i2t"]
    assert 0 <= res["Recall@1"] <= res["Recall@5"] <= res["Recall@10"] <= 1
    assert 1 <= res["MeanRank"] <= 20


class _FakeExtractor:
    """Returns fixed text embeddings so the zero-shot path is testable without a model."""

    def __init__(self, text_emb_map):
        self.text_emb_map = text_emb_map
        self.calls = 0

    def encode_texts(self, input_ids, attention_mask):
        emb = self.text_emb_map[self.calls]
        self.calls += 1
        return emb


def test_eval_zeroshot_auroc_and_density():
    rng = np.random.default_rng(3)
    d = 4
    neg_dir = np.array([1.0, 0, 0, 0])
    pos_dir = np.array([0, 1.0, 0, 0])
    text_emb = np.stack([neg_dir, pos_dir])
    n = 40
    y = rng.integers(0, 2, n)
    img = np.where(y[:, None] == 1, pos_dir, neg_dir) + 0.05 * rng.standard_normal((n, d))
    img /= np.linalg.norm(img, axis=1, keepdims=True)

    from mammo_clip_tpu.data.tokenizer import HashTokenizer

    tok = HashTokenizer(vocab_size=64)
    extractor = _FakeExtractor({0: text_emb})
    res = eval_zeroshot(
        extractor, tok, img, {"mass": y}, {"mass": ["no mass", "mass"]}, max_length=8
    )
    assert res["mass"] > 0.95

    # density: 4 prompts, argmax accuracy
    dirs = np.eye(4)
    labels = rng.integers(0, 4, n)
    img_d = dirs[labels] + 0.05 * rng.standard_normal((n, 4))
    extractor2 = _FakeExtractor({0: dirs})
    res2 = eval_zeroshot(
        extractor2, tok, img_d, {"density": labels}, {"density": ["a", "b", "c", "d"]}, max_length=8
    )
    assert res2["density"] > 0.9


def test_default_prompts_match_reference_config():
    # configs/zs_clip.yaml:28-39
    assert DEFAULT_ZS_PROMPTS["vindr"]["mass"] == ["no mass", "mass"]
    assert DEFAULT_ZS_PROMPTS["rsna"]["malignancy"] == ["no malignancy", "malignancy"]
