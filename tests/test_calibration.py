"""Temperature scaling + ECE (evaluate/calibration.py)."""

import numpy as np

from toad_tpu.evaluate.calibration import (
    apply_temperature,
    calibration_report,
    fit_temperature,
    nll,
    top_label_ece,
)


def _synthetic(n=4000, c=6, sharpness=3.0, seed=0):
    """Labels drawn FROM softmax(logits) — so T=1 logits are perfectly
    calibrated by construction; sharpened copies are overconfident."""
    rng = np.random.RandomState(seed)
    logits = rng.randn(n, c) * 1.5
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    y = np.array([rng.choice(c, p=pi) for pi in p])
    over = apply_temperature(p, 1.0 / sharpness)  # sharpen: overconfident
    return p, over, y


def test_ece_overconfidence_detected_and_fixed():
    p_cal, p_over, y = _synthetic()
    assert top_label_ece(p_over, y) > top_label_ece(p_cal, y) + 0.05
    t = fit_temperature(p_over, y)
    # recovers roughly the sharpening factor
    assert 2.0 < t < 4.5
    fixed = apply_temperature(p_over, t)
    assert top_label_ece(fixed, y) < top_label_ece(p_over, y) / 2
    assert nll(fixed, y) < nll(p_over, y)


def test_temperature_is_near_one_when_calibrated():
    p_cal, _, y = _synthetic(seed=3)
    t = fit_temperature(p_cal, y)
    assert 0.8 < t < 1.25


def test_apply_temperature_preserves_argmax_and_simplex():
    rng = np.random.RandomState(1)
    p = rng.dirichlet(np.ones(5), 200)
    for t in (0.3, 1.0, 4.0):
        q = apply_temperature(p, t)
        np.testing.assert_allclose(q.sum(1), 1.0, atol=1e-12)
        np.testing.assert_array_equal(q.argmax(1), p.argmax(1))
    np.testing.assert_allclose(apply_temperature(p, 1.0), p, atol=1e-12)


def test_calibration_report_fits_on_val_only():
    """The report's T comes from the val arrays: an overconfident val set
    yields T>1 applied to eval, even if eval is already calibrated."""
    p_cal, p_over, y = _synthetic(seed=5)
    rep = calibration_report(p_over[:2000], y[:2000], p_cal[2000:], y[2000:])
    assert rep["temperature"] > 2.0
    assert rep["val_ece_after"] < rep["val_ece_before"]
    # over-smoothing a calibrated eval split hurts its NLL — visible honestly
    assert rep["nll_after"] > rep["nll_before"]


def test_ece_handles_empty_bins_and_perfect_confidence():
    y = np.array([0, 1])
    p = np.array([[1.0, 0.0], [0.0, 1.0]])
    assert top_label_ece(p, y) == 0.0  # conf 1.0 in last bin, acc 1.0
    p_wrong = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert abs(top_label_ece(p_wrong, y) - 1.0) < 1e-12
