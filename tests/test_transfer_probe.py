"""The real-scale transfer probe (benchmarks/real_scale_transfer.py) extends
the graded-gate parity evidence from zero-shot to the reference's linear-probe
protocol (frozen encoder + linear readout — train_classifier.py with
model.freeze_backbone). Keep its metric block — the piece BASELINE.md r5
numbers flow through — correct on known inputs."""

import numpy as np


def _metrics(prob, labels, amps):
    from benchmarks.real_scale_transfer import probe_metrics

    return probe_metrics(np.asarray(prob, np.float64),
                         np.asarray(labels), np.asarray(amps, np.int32))


def test_perfect_probe_scores_one():
    # 8 samples, 4 classes, two amplitude buckets; probabilities put all mass
    # on the true class -> AUROC 1.0 per class, acc 1.0 in every bucket
    labels = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    amps = np.array([20, 20, 20, 20, 90, 90, 90, 90])
    prob = np.full((8, 4), 0.02)
    prob[np.arange(8), labels] = 0.94
    m = _metrics(prob, labels, amps)
    assert m["macro_auroc"] == 1.0
    assert m["acc"] == 1.0
    assert m["acc_amp"]["20"] == 1.0 and m["acc_amp"]["90"] == 1.0
    # buckets with no positive-class samples report null, not NaN
    assert m["acc_amp"]["35"] is None and m["acc_amp"]["60"] is None


def test_chance_probe_scores_half():
    rng = np.random.default_rng(0)
    labels = np.tile([0, 1, 2, 3], 64)
    amps = np.tile([20, 35, 60, 90], 64)
    prob = rng.dirichlet(np.ones(4), size=256)  # label-independent scores
    m = _metrics(prob, labels, amps)
    assert 0.35 < m["macro_auroc"] < 0.65
    assert 0.10 < m["acc"] < 0.45


def test_bucket_separation_shows_in_acc_amp():
    # probe solves amp-90 rows, guesses class 0 on amp-20 rows -> the graded
    # instrument must separate the buckets
    labels = np.tile([1, 2, 3], 20)
    amps = np.array([20, 90] * 30)
    prob = np.full((60, 4), 1 / 4)
    hit = amps == 90
    prob[hit] = 0.01
    prob[hit, labels[hit]] = 0.97
    prob[~hit] = [0.97, 0.01, 0.01, 0.01]
    m = _metrics(prob, labels, amps)
    assert m["acc_amp"]["90"] == 1.0
    assert m["acc_amp"]["20"] == 0.0
