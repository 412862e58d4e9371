"""Metric correctness vs sklearn (and torchmetrics semantics)."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from druglamp_tpu.eval.metrics import auroc, average_precision, binary_metrics, MetricCollector


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [10, 101, 1000])
def test_auroc_matches_sklearn(seed, n):
    r = np.random.RandomState(seed)
    preds = r.rand(n)
    targets = (r.rand(n) < 0.4).astype(int)
    if targets.min() == targets.max():
        targets[0] = 1 - targets[0]
    assert auroc(preds, targets) == pytest.approx(roc_auc_score(targets, preds), abs=1e-10)


def test_auroc_with_ties():
    preds = np.array([0.5, 0.5, 0.5, 0.8, 0.2])
    targets = np.array([1, 0, 1, 1, 0])
    assert auroc(preds, targets) == pytest.approx(roc_auc_score(targets, preds), abs=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_average_precision_matches_sklearn(seed):
    r = np.random.RandomState(seed)
    preds = r.rand(500)
    targets = (r.rand(500) < 0.3).astype(int)
    assert average_precision(preds, targets) == pytest.approx(
        average_precision_score(targets, preds), abs=1e-10)


def test_average_precision_ties():
    preds = np.array([0.7, 0.7, 0.3, 0.3, 0.1])
    targets = np.array([1, 0, 1, 0, 1])
    assert average_precision(preds, targets) == pytest.approx(
        average_precision_score(targets, preds), abs=1e-10)


def test_binary_metrics():
    preds = np.array([0.9, 0.8, 0.3, 0.6, 0.1])
    targets = np.array([1, 0, 0, 1, 1])
    m = binary_metrics(preds, targets)
    # pred_cls = [1,1,0,1,0]; tp=2 fp=1 tn=1 fn=1
    assert m["acc"] == pytest.approx(3 / 5)
    assert m["sn"] == pytest.approx(2 / 3)
    assert m["sp"] == pytest.approx(1 / 2)
    assert m["pr"] == pytest.approx(2 / 3)
    assert m["f1"] == pytest.approx(2 / 3)


def test_collector_streaming_equals_batch():
    r = np.random.RandomState(3)
    preds = r.rand(300)
    targets = (r.rand(300) < 0.5).astype(int)
    c = MetricCollector()
    for i in range(0, 300, 32):
        c.update(preds[i : i + 32], targets[i : i + 32])
    m = c.compute(full=True)
    assert m["auroc"] == pytest.approx(roc_auc_score(targets, preds), abs=1e-10)
    assert m["auprc"] == pytest.approx(average_precision_score(targets, preds), abs=1e-10)
    assert m["ausum"] == pytest.approx(m["auroc"] + m["auprc"])


def test_degenerate_single_class():
    assert np.isnan(auroc(np.array([0.1, 0.2]), np.array([1, 1])))
    assert np.isnan(average_precision(np.array([0.1, 0.2]), np.array([0, 0])))
