"""Numpy-native metrics vs sklearn (the reference's metric backend)."""

import numpy as np
import pytest

from toad_tpu.evaluate.metrics import (
    AccuracyLogger,
    binary_auc,
    error_rate,
    macro_ovr_auc,
    micro_ovr_auc,
    ovr_aucs,
    topk_accuracy,
)

sklearn_metrics = pytest.importorskip("sklearn.metrics")
from sklearn.preprocessing import label_binarize  # noqa: E402


def test_binary_auc_vs_sklearn():
    rng = np.random.RandomState(0)
    for _ in range(20):
        labels = rng.randint(0, 2, 200)
        scores = rng.randn(200)
        # inject ties
        scores[::7] = 0.5
        ours = binary_auc(labels, scores)
        ref = sklearn_metrics.roc_auc_score(labels, scores)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_binary_auc_degenerate():
    assert np.isnan(binary_auc(np.ones(5), np.random.randn(5)))
    assert np.isnan(binary_auc(np.zeros(5), np.random.randn(5)))


def test_ovr_macro_vs_sklearn():
    rng = np.random.RandomState(1)
    n, c = 300, 8
    labels = rng.randint(0, c, n)
    probs = rng.dirichlet(np.ones(c), size=n)
    ours = ovr_aucs(labels, probs, c)
    binary = label_binarize(labels, classes=list(range(c)))
    for k in range(c):
        ref = sklearn_metrics.roc_auc_score(binary[:, k], probs[:, k])
        np.testing.assert_allclose(ours[k], ref, rtol=1e-12)
    # macro path matches the reference's nanmean (core_utils:322-331)
    np.testing.assert_allclose(macro_ovr_auc(labels, probs, c), np.nanmean(ours), rtol=1e-12)


def test_absent_class_is_nan():
    rng = np.random.RandomState(2)
    labels = rng.randint(0, 3, 100)  # classes 3,4 absent
    probs = rng.dirichlet(np.ones(5), size=100)
    aucs = ovr_aucs(labels, probs, 5)
    assert np.isnan(aucs[3]) and np.isnan(aucs[4])
    assert not np.isnan(macro_ovr_auc(labels, probs, 5))


def test_micro_vs_sklearn():
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 4, 200)
    probs = rng.dirichlet(np.ones(6), size=200)
    ours = micro_ovr_auc(labels, probs, 6)
    binary = label_binarize(labels, classes=list(range(6)))
    valid = np.where(np.any(binary, axis=0))[0]
    ref = sklearn_metrics.roc_auc_score(binary[:, valid].ravel(), probs[:, valid].ravel())
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_topk():
    probs = np.array(
        [
            [0.1, 0.5, 0.2, 0.2],
            [0.4, 0.3, 0.2, 0.1],
            [0.25, 0.25, 0.3, 0.2],
        ]
    )
    labels = np.array([1, 2, 0])
    accs = topk_accuracy(probs, labels, ks=(1, 3))
    np.testing.assert_allclose(accs[1], 1 / 3)
    np.testing.assert_allclose(accs[3], 3 / 3)


def test_error_rate_and_logger():
    preds = np.array([0, 1, 1, 2])
    labels = np.array([0, 1, 2, 2])
    assert error_rate(preds, labels) == 0.25
    logger = AccuracyLogger(3)
    logger.log_batch(preds, labels)
    acc0, correct0, count0 = logger.get_summary(0)
    assert (acc0, correct0, count0) == (1.0, 1, 1)
    acc2, correct2, count2 = logger.get_summary(2)
    assert (acc2, correct2, count2) == (0.5, 1, 2)
