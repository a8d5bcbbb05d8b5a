"""Temperature scaling + ECE (evaluate/calibration.py)."""

import numpy as np
import pytest

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


# ---- ensemble temperature (one T for the mean-of-folds mixture) ------------


def _overconfident_members(k=3, n=400, c=6, seed=0):
    """K CORRELATED overconfident members (shared logits + small per-member
    jitter, scaled up) — the CV-fold regime: folds are similar models, so
    averaging does NOT wash the overconfidence out and the mixture needs
    T > 1. (With independent member noise the mean is already tempered and
    the fitted T can legitimately be < 1.)"""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, c, n)
    shared = rng.randn(n, c)
    shared[np.arange(n), labels] += 1.2  # real but imperfect signal
    members = []
    for _ in range(k):
        logits = (shared + rng.randn(n, c) * 0.3) * 4.0  # overconfidence
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        members.append(e / e.sum(axis=1, keepdims=True))
    return np.stack(members), labels


def test_apply_ensemble_temperature_is_member_then_mean():
    from toad_tpu.evaluate.calibration import (
        apply_ensemble_temperature, apply_temperature,
    )

    member, _ = _overconfident_members()
    got = apply_ensemble_temperature(member, 2.5)
    want = np.mean([apply_temperature(p, 2.5) for p in member], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # NOT the same as tempering the averaged probabilities (mixture != softmax)
    post_mean = apply_temperature(member.mean(axis=0), 2.5)
    assert np.abs(got - post_mean).max() > 1e-3
    with pytest.raises(ValueError, match=r"\[K, N, C\]"):
        apply_ensemble_temperature(member[0], 2.0)


def test_fit_ensemble_temperature_reduces_nll_and_ece():
    from toad_tpu.evaluate.calibration import (
        apply_ensemble_temperature, fit_ensemble_temperature, nll, top_label_ece,
    )

    member, labels = _overconfident_members()
    t = fit_ensemble_temperature(member, labels)
    assert t > 1.5  # overconfident members need T > 1
    raw = apply_ensemble_temperature(member, 1.0)
    cal = apply_ensemble_temperature(member, t)
    assert nll(cal, labels) < nll(raw, labels)
    assert top_label_ece(cal, labels) < top_label_ece(raw, labels)


def test_fit_ensemble_temperature_single_member_matches_fit_temperature():
    from toad_tpu.evaluate.calibration import fit_ensemble_temperature, fit_temperature

    member, labels = _overconfident_members(k=1)
    t1 = fit_temperature(member[0], labels)
    tk = fit_ensemble_temperature(member, labels)
    assert abs(t1 - tk) < 1e-2


def test_ensemble_calibration_report_fits_on_mask_only():
    from toad_tpu.evaluate.calibration import (
        ensemble_calibration_report, fit_ensemble_temperature,
    )

    member, labels = _overconfident_members()
    mask = np.zeros(len(labels), bool)
    mask[:120] = True
    rep = ensemble_calibration_report(member, labels, mask)
    want_t = fit_ensemble_temperature(member[:, mask], labels[mask])
    assert abs(rep["temperature"] - want_t) < 1e-9
    assert rep["n_fit_slides"] == 120 and rep["n_members"] == 3
    assert rep["ece_after"] <= rep["ece_before"] + 0.05
    assert rep["nll_after"] <= rep["nll_before"] + 1e-9
    with pytest.raises(ValueError, match="no slides"):
        ensemble_calibration_report(member, labels, np.zeros(len(labels), bool))
