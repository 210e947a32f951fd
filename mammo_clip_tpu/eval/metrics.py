"""Evaluation metrics (reference: src/codebase/metrics.py:6-89 and
evaluator.py:301-346).

AUROC/AUPRC via sklearn (as the reference does); pfbeta is the Kaggle RSNA
probabilistic-F1, vectorized instead of the reference's python loop.
"""

from __future__ import annotations

import numpy as np
from sklearn import metrics as skm


def auroc(gt, pred) -> float:
    return float(skm.roc_auc_score(np.asarray(gt), np.asarray(pred)))


def auprc(gt, pred) -> float:
    return float(skm.average_precision_score(np.asarray(gt), np.asarray(pred)))


def pr_auc(gt, pred) -> float:
    precision, recall, _ = skm.precision_recall_curve(np.asarray(gt), np.asarray(pred))
    return float(skm.auc(recall, precision))


def accuracy(gt, pred_labels) -> float:
    return float(skm.accuracy_score(np.asarray(gt), np.asarray(pred_labels)))


def pfbeta(gt, pred, beta: float = 1.0) -> float:
    """Probabilistic F-beta (Kaggle RSNA metric). Predictions clipped to [0,1];
    ctp = sum of clipped predictions over positives, cfp over negatives."""
    gt = np.asarray(gt).astype(bool)
    pred = np.clip(np.asarray(pred, dtype=np.float64), 0.0, 1.0)
    y_true_count = int(gt.sum())
    if y_true_count == 0:
        return 0.0
    ctp = pred[gt].sum()
    cfp = pred[~gt].sum()
    beta2 = beta * beta
    c_precision = ctp / (ctp + cfp) if (ctp + cfp) > 0 else 0.0
    c_recall = ctp / y_true_count
    if c_precision > 0 and c_recall > 0:
        return float((1 + beta2) * c_precision * c_recall / (beta2 * c_precision + c_recall))
    return 0.0


def pfbeta_binarized(gt, pred) -> float:
    """Threshold sweep over positive-prediction values, maximizing binarized pfbeta
    (reference evaluator.py:301-309)."""
    gt = np.asarray(gt)
    pred = np.asarray(pred)
    thresholds = pred[gt == 1]
    if thresholds.size == 0:
        return 0.0
    return max(pfbeta(gt, (pred >= th).astype(np.int32), 1.0) for th in thresholds)
