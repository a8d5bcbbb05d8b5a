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


def test_bootstrap_cis_bracket_and_shrink():
    """Percentile-bootstrap CIs bracket the point estimate, and widths
    shrink roughly like 1/sqrt(n) as the slide count grows."""
    from toad_tpu.evaluate.metrics import bootstrap_cis

    rng = np.random.RandomState(0)

    def make(n, c=4):
        y = rng.randint(0, c, n)
        p = rng.dirichlet(np.ones(c), n) * 0.8 + 0.2 * np.eye(c)[y]  # informative but imperfect
        p /= p.sum(1, keepdims=True)
        site = rng.randint(0, 2, n)
        sp = np.clip(0.7 * site + 0.3 * rng.rand(n), 0, 1)
        return y, p, site, sp

    y, p, site, sp = make(400)
    cis = bootstrap_cis(y, p, site, sp, n_boot=200, seed=3)
    point_auc = macro_ovr_auc(y, p, 4)
    point_acc = float((p.argmax(1) == y).mean())
    assert cis["cls_auc"]["lo"] <= point_auc <= cis["cls_auc"]["hi"]
    assert cis["cls_acc"]["lo"] <= point_acc <= cis["cls_acc"]["hi"]
    assert cis["site_auc"]["lo"] <= binary_auc(site, sp) <= cis["site_auc"]["hi"]
    assert all(v["n_valid"] == 200 for v in cis.values())

    y2, p2, site2, sp2 = make(6400)
    cis2 = bootstrap_cis(y2, p2, site2, sp2, n_boot=200, seed=3)
    w1 = cis["cls_acc"]["hi"] - cis["cls_acc"]["lo"]
    w2 = cis2["cls_acc"]["hi"] - cis2["cls_acc"]["lo"]
    assert w2 < w1 / 2  # 16x the slides -> ~4x narrower; demand at least 2x


def test_bootstrap_cis_degenerate_site():
    """Single-class site labels: every draw's site AUC is undefined -> nan
    outputs with n_valid=0, no warnings/crash; cls metrics unaffected."""
    from toad_tpu.evaluate.metrics import bootstrap_cis

    rng = np.random.RandomState(1)
    n, c = 50, 3
    y = rng.randint(0, c, n)
    p = rng.dirichlet(np.ones(c), n)
    cis = bootstrap_cis(y, p, np.zeros(n), rng.rand(n), n_boot=50, seed=2)
    assert cis["site_auc"]["n_valid"] == 0
    assert np.isnan(cis["site_auc"]["mean"]) and np.isnan(cis["site_auc"]["lo"])
    assert cis["cls_auc"]["n_valid"] == 50


def test_bootstrap_cis_binary_and_micro_paths():
    """n_classes=2 routes through binary AUC; micro_average matches the
    micro point estimate's neighborhood."""
    from toad_tpu.evaluate.metrics import bootstrap_cis

    rng = np.random.RandomState(4)
    n = 300
    y = rng.randint(0, 2, n)
    p1 = np.clip(0.6 * y + 0.4 * rng.rand(n), 0, 1)
    p = np.stack([1 - p1, p1], 1)
    cis = bootstrap_cis(y, p, y, p1, n_boot=100, seed=5)
    assert cis["cls_auc"]["lo"] <= binary_auc(y, p1) <= cis["cls_auc"]["hi"]

    y3 = rng.randint(0, 5, n)
    p3 = rng.dirichlet(np.ones(5), n) * 0.4 + 0.6 * np.eye(5)[y3]
    cis3 = bootstrap_cis(y3, p3, y, p1, n_boot=100, seed=5, micro_average=True)
    assert cis3["cls_auc"]["lo"] <= micro_ovr_auc(y3, p3, 5) <= cis3["cls_auc"]["hi"]


def test_bootstrap_cis_no_degenerate_top3():
    """cls_top3_acc is omitted when n_classes <= 3 (it would be the constant
    1.0 while summary.csv's top-3 column is NaN — contradictory artifacts)."""
    from toad_tpu.evaluate.metrics import bootstrap_cis

    rng = np.random.RandomState(9)
    n = 80
    for c in (2, 3):
        y = rng.randint(0, c, n)
        p = rng.dirichlet(np.ones(c), n)
        cis = bootstrap_cis(y, p, rng.randint(0, 2, n), rng.rand(n), n_boot=20)
        assert "cls_top3_acc" not in cis
    y = rng.randint(0, 4, n)
    p = rng.dirichlet(np.ones(4), n)
    cis = bootstrap_cis(y, p, rng.randint(0, 2, n), rng.rand(n), n_boot=20)
    assert "cls_top3_acc" in cis
