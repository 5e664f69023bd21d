"""Linear models + probability calibration, JAX-native.

Replaces the reference's scikit-learn estimators in the fusion/calibration
layers with closed-loop JAX solvers, so the whole serving path stays on
device:

- :class:`LogisticRegression` — Newton-Raphson (L2 / unregularized) and
  proximal-gradient (L1, liblinear analog) solvers. Used for:
  * the final-stack meta-learner (stack_blend.py:255-258,
    LogisticRegression(max_iter=1000));
  * the L1 MetaStacker (src/fusion/meta_learner.py:5-28);
  * class-balanced variants (models/stack_blend.py:180-182).
- :func:`platt_calibrate` — sigmoid calibration with Platt's prior-corrected
  targets (sklearn CalibratedClassifierCV(method='sigmoid') semantics;
  reference: xgboost_model.py:175-176, src/fusion/calibration.py:7-32).
- :func:`isotonic_calibrate` — PAVA isotonic regression with clip-out-of-
  bounds interpolation (IsotonicRegression(out_of_bounds='clip') parity).
- :class:`TemperatureScaler` — single-temperature scaling fit with LBFGS
  (train_mm_joint_dualtask.py:162-174,270-287 uses torch LBFGS; here optax).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# Logistic regression
# ---------------------------------------------------------------------------


@dataclass
class LogisticRegression:
    """Binary logistic regression.

    penalty: 'none' | 'l2' | 'l1'; C is the inverse regularization strength
    (sklearn convention). class_weight='balanced' reweights like sklearn.
    """

    penalty: str = "l2"
    C: float = 1.0
    max_iter: int = 100
    tol: float = 1e-8
    class_weight: str | None = None
    fit_intercept: bool = True
    coef_: np.ndarray | None = field(default=None, repr=False)
    intercept_: float = 0.0

    def _sample_weights(self, y: np.ndarray) -> np.ndarray:
        w = np.ones(y.size, dtype=np.float64)
        if self.class_weight == "balanced":
            for cls in (0, 1):
                m = y == cls
                if m.any():
                    w[m] = y.size / (2.0 * m.sum())
        return w

    def fit(self, X, y, sample_weight=None) -> "LogisticRegression":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64).reshape(-1)
        w = self._sample_weights(y.astype(int))
        if sample_weight is not None:
            w = w * np.asarray(sample_weight, dtype=np.float64)

        Xd = jnp.asarray(np.c_[X, np.ones(len(X))] if self.fit_intercept else X)
        yd = jnp.asarray(y)
        wd = jnp.asarray(w)
        d = Xd.shape[1]
        lam = 0.0 if self.penalty == "none" else 1.0 / self.C
        # lbfgs-style solvers don't regularize the intercept; liblinear (the
        # reference's L1 solver, meta_learner.py:12) does — match each.
        reg_mask = jnp.ones(d)
        if self.fit_intercept and self.penalty != "l1":
            reg_mask = reg_mask.at[-1].set(0.0)

        if self.penalty in ("none", "l2"):
            beta = _newton_logistic(Xd, yd, wd, lam, reg_mask, self.max_iter, self.tol)
        elif self.penalty == "l1":
            beta = _prox_logistic(Xd, yd, wd, lam, reg_mask, max(self.max_iter, 2000), self.tol)
        else:
            raise ValueError(self.penalty)

        beta = np.asarray(beta, dtype=np.float64)
        if self.fit_intercept:
            self.coef_, self.intercept_ = beta[:-1], float(beta[-1])
        else:
            self.coef_, self.intercept_ = beta, 0.0
        return self

    def decision_function(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return X @ self.coef_ + self.intercept_

    def predict_proba(self, X) -> np.ndarray:
        z = self.decision_function(X)
        p = 1.0 / (1.0 + np.exp(-z))
        return np.c_[1 - p, p]

    def predict(self, X, threshold: float = 0.5) -> np.ndarray:
        return (self.predict_proba(X)[:, 1] >= threshold).astype(int)

    @property
    def weights_simplex(self) -> np.ndarray:
        """Clipped-nonnegative, sum-1 coefficient view
        (MetaStacker.weights parity, meta_learner.py:20-28)."""
        w = np.clip(self.coef_, 0, None)
        s = w.sum()
        return w / s if s > 0 else np.full_like(w, 1.0 / max(w.size, 1))


def _newton_logistic(X, y, w, lam, reg_mask, max_iter, tol):
    d = X.shape[1]

    def body(carry):
        beta, i, delta = carry
        z = X @ beta
        p = jax.nn.sigmoid(z)
        g = X.T @ (w * (p - y)) + lam * reg_mask * beta
        s = w * p * (1 - p) + 1e-12
        H = (X * s[:, None]).T @ X + lam * jnp.diag(reg_mask)
        step = jnp.linalg.solve(H, g)
        return beta - step, i + 1, jnp.max(jnp.abs(step))

    def cond(carry):
        _, i, delta = carry
        return (i < max_iter) & (delta > tol)

    beta0 = jnp.zeros(d)
    beta, _, _ = jax.lax.while_loop(cond, body, (beta0, 0, jnp.inf))
    return beta


def _prox_logistic(X, y, w, lam, reg_mask, max_iter, tol):
    """FISTA with soft-thresholding (L1)."""
    n, d = X.shape
    # Lipschitz bound for weighted logistic grad: 0.25 * ||sqrt(w) X||^2
    L = 0.25 * jnp.linalg.norm(X * jnp.sqrt(w)[:, None], ord=2) ** 2 + 1e-9
    step = 1.0 / L

    def grad(beta):
        p = jax.nn.sigmoid(X @ beta)
        return X.T @ (w * (p - y))

    def body(carry):
        beta, z, t, i, delta = carry
        g = grad(z)
        raw = z - step * g
        thr = step * lam * reg_mask
        beta_new = jnp.sign(raw) * jnp.maximum(jnp.abs(raw) - thr, 0.0)
        t_new = 0.5 * (1 + jnp.sqrt(1 + 4 * t * t))
        z_new = beta_new + (t - 1) / t_new * (beta_new - beta)
        return beta_new, z_new, t_new, i + 1, jnp.max(jnp.abs(beta_new - beta))

    def cond(carry):
        _, _, _, i, delta = carry
        return (i < max_iter) & (delta > tol)

    beta0 = jnp.zeros(d)
    beta, *_ = jax.lax.while_loop(cond, body, (beta0, beta0, 1.0, 0, jnp.inf))
    return beta


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


@dataclass
class PlattCalibrator:
    a: float = 1.0
    b: float = 0.0

    def transform(self, p) -> np.ndarray:
        z = np.asarray(p, dtype=np.float64)
        return 1.0 / (1.0 + np.exp(-(self.a * z + self.b)))


def platt_calibrate(scores, y, prior_correction: bool = True) -> PlattCalibrator:
    """Sigmoid calibration on scores (probabilities or logits).

    With ``prior_correction`` uses Platt's (n+1)/(n+2) targets like sklearn's
    _SigmoidCalibration; reference sites: xgboost_model.py:175-176 ('sigmoid'),
    src/fusion/calibration.py ('platt' = plain LR on prob).
    """
    s = np.asarray(scores, dtype=np.float64).reshape(-1, 1)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    if prior_correction:
        n_pos, n_neg = y.sum(), (1 - y).sum()
        t = np.where(y > 0, (n_pos + 1) / (n_pos + 2), 1.0 / (n_neg + 2))
    else:
        t = y
    Xd = jnp.asarray(np.c_[s, np.ones(len(s))])
    td = jnp.asarray(t)
    wd = jnp.ones(len(s))
    beta = _newton_logistic(Xd, td, wd, 0.0, jnp.zeros(2), 100, 1e-10)
    a, b = float(beta[0]), float(beta[1])
    return PlattCalibrator(a=a, b=b)


@dataclass
class IsotonicCalibrator:
    x_thresholds: np.ndarray = field(default_factory=lambda: np.zeros(0))
    y_thresholds: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def transform(self, p) -> np.ndarray:
        x = np.asarray(p, dtype=np.float64)
        # out_of_bounds='clip' + linear interpolation (sklearn parity)
        return np.interp(x, self.x_thresholds, self.y_thresholds)


def _pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators; returns the isotonic fit of y with weights w."""
    n = y.size
    sol = y.astype(np.float64).copy()
    wgt = w.astype(np.float64).copy()
    idx = np.arange(n)
    # block representation
    start = list(range(n))
    vals = list(sol)
    ws = list(wgt)
    i = 0
    while i < len(vals) - 1:
        if vals[i] > vals[i + 1] + 1e-15:
            new_w = ws[i] + ws[i + 1]
            new_v = (vals[i] * ws[i] + vals[i + 1] * ws[i + 1]) / new_w
            vals[i : i + 2] = [new_v]
            ws[i : i + 2] = [new_w]
            start.pop(i + 1)
            i = max(i - 1, 0)
        else:
            i += 1
    out = np.empty(n)
    bounds = start + [n]
    for k in range(len(vals)):
        out[bounds[k] : bounds[k + 1]] = vals[k]
    return out


def isotonic_calibrate(scores, y) -> IsotonicCalibrator:
    s = np.asarray(scores, dtype=np.float64).reshape(-1)
    t = np.asarray(y, dtype=np.float64).reshape(-1)
    order = np.argsort(s, kind="mergesort")
    s_s, t_s = s[order], t[order]
    # merge duplicate x by weighted mean (sklearn make_unique)
    ux, inv, counts = np.unique(s_s, return_inverse=True, return_counts=True)
    ty = np.zeros(ux.size)
    np.add.at(ty, inv, t_s)
    ty /= counts
    fit = _pava(ty, counts.astype(np.float64))
    return IsotonicCalibrator(x_thresholds=ux, y_thresholds=fit)


def make_calibrator(kind: str, scores, y):
    """'platt' | 'isotonic' | 'none' (src/fusion/calibration.py:7-32)."""
    if kind == "platt":
        return platt_calibrate(scores, y, prior_correction=False)
    if kind == "sigmoid":
        return platt_calibrate(scores, y, prior_correction=True)
    if kind == "isotonic":
        return isotonic_calibrate(scores, y)
    if kind in ("none", None):

        class _Id:
            def transform(self, p):
                return np.asarray(p)

        return _Id()
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Temperature scaling
# ---------------------------------------------------------------------------


@dataclass
class TemperatureScaler:
    """Single-parameter temperature on binary logits; fit minimizes BCE
    (train_mm_joint_dualtask.py:162-174 semantics, LBFGS optimizer)."""

    temperature: float = 1.0

    def fit(self, logits, y, max_iter: int = 50) -> "TemperatureScaler":
        z = jnp.asarray(np.asarray(logits, dtype=np.float32).reshape(-1))
        t = jnp.asarray(np.asarray(y, dtype=np.float32).reshape(-1))

        def loss(log_T):
            zz = z / jnp.exp(log_T)
            return jnp.mean(jnp.logaddexp(0.0, zz) - t * zz)

        opt = optax.lbfgs()
        params = jnp.zeros(())
        state = opt.init(params)
        vg = jax.value_and_grad(loss)

        @jax.jit
        def step(params, state):
            val, g = vg(params)
            updates, state = opt.update(
                g, state, params, value=val, grad=g, value_fn=loss
            )
            return optax.apply_updates(params, updates), state, val

        for _ in range(max_iter):
            params, state, _ = step(params, state)
        self.temperature = float(np.exp(params))
        return self

    def transform_logits(self, logits) -> np.ndarray:
        return np.asarray(logits) / self.temperature

    def transform(self, logits) -> np.ndarray:
        z = self.transform_logits(logits)
        return 1.0 / (1.0 + np.exp(-z))
