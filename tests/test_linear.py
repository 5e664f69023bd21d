"""Linear models & calibration: sklearn parity."""

import numpy as np
import pytest

from mmtrs_tpu.models.linear import (
    LogisticRegression,
    TemperatureScaler,
    isotonic_calibrate,
    make_calibrator,
    platt_calibrate,
)


@pytest.fixture
def problem(rng):
    n = 400
    X = rng.normal(size=(n, 3))
    beta = np.array([1.5, -2.0, 0.5])
    p = 1 / (1 + np.exp(-(X @ beta + 0.3)))
    y = (rng.random(n) < p).astype(int)
    return X, y


def test_logreg_unregularized_matches_sklearn(problem):
    from sklearn.linear_model import LogisticRegression as SkLR

    X, y = problem
    ours = LogisticRegression(penalty="none", max_iter=200).fit(X, y)
    skl = SkLR(penalty=None, max_iter=2000, tol=1e-10).fit(X, y)
    np.testing.assert_allclose(ours.coef_, skl.coef_[0], atol=1e-4)
    assert ours.intercept_ == pytest.approx(skl.intercept_[0], abs=1e-4)


def test_logreg_l2_matches_sklearn(problem):
    from sklearn.linear_model import LogisticRegression as SkLR

    X, y = problem
    ours = LogisticRegression(penalty="l2", C=1.0, max_iter=200).fit(X, y)
    skl = SkLR(penalty="l2", C=1.0, max_iter=2000, tol=1e-10).fit(X, y)
    np.testing.assert_allclose(ours.coef_, skl.coef_[0], atol=1e-4)
    assert ours.intercept_ == pytest.approx(skl.intercept_[0], abs=1e-4)


def test_logreg_balanced_matches_sklearn(problem):
    from sklearn.linear_model import LogisticRegression as SkLR

    X, y = problem
    ours = LogisticRegression(penalty="l2", class_weight="balanced").fit(X, y)
    skl = SkLR(class_weight="balanced", max_iter=2000, tol=1e-10).fit(X, y)
    np.testing.assert_allclose(ours.coef_, skl.coef_[0], atol=1e-3)


def test_logreg_l1_matches_sklearn(problem):
    from sklearn.linear_model import LogisticRegression as SkLR

    X, y = problem
    ours = LogisticRegression(penalty="l1", C=0.5, max_iter=20000, tol=1e-10).fit(X, y)
    skl = SkLR(penalty="l1", C=0.5, solver="liblinear", max_iter=5000, tol=1e-10).fit(X, y)
    np.testing.assert_allclose(ours.coef_, skl.coef_[0], atol=5e-3)
    # simplex view (MetaStacker.weights parity)
    w = ours.weights_simplex
    assert w.sum() == pytest.approx(1.0)
    assert (w >= 0).all()


def test_platt_matches_sklearn_sigmoid(rng):
    from sklearn.calibration import _SigmoidCalibration

    s = rng.normal(size=300)
    y = (rng.random(300) < 1 / (1 + np.exp(-2 * s))).astype(int)
    ours = platt_calibrate(s, y, prior_correction=True)
    skl = _SigmoidCalibration().fit(s, y)
    np.testing.assert_allclose(
        ours.transform(s), skl.predict(s), atol=1e-4
    )


def test_isotonic_matches_sklearn(rng):
    from sklearn.isotonic import IsotonicRegression

    s = np.round(rng.random(200), 2)  # force ties
    y = (rng.random(200) < s).astype(float)
    ours = isotonic_calibrate(s, y)
    skl = IsotonicRegression(out_of_bounds="clip").fit(s, y)
    q = rng.random(50) * 1.4 - 0.2  # includes out-of-range
    np.testing.assert_allclose(ours.transform(q), skl.predict(q), atol=1e-10)


def test_make_calibrator_none_identity():
    c = make_calibrator("none", None, None)
    p = np.array([0.2, 0.8])
    np.testing.assert_array_equal(c.transform(p), p)


def test_temperature_scaler_recovers_temperature(rng):
    true_T = 2.5
    z = rng.normal(scale=2.0, size=2000)
    p = 1 / (1 + np.exp(-z / true_T))
    y = (rng.random(2000) < p).astype(np.float32)
    ts = TemperatureScaler().fit(z, y)
    assert ts.temperature == pytest.approx(true_T, rel=0.15)
    # calibrated probs should have lower BCE than raw
    def bce(prob):
        prob = np.clip(prob, 1e-7, 1 - 1e-7)
        return -np.mean(y * np.log(prob) + (1 - y) * np.log(1 - prob))

    assert bce(ts.transform(z)) < bce(1 / (1 + np.exp(-z)))
