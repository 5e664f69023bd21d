"""JAX histogram GBDT: quality vs sklearn HistGradientBoosting, semantics."""

import numpy as np
import pytest

from mmtrs_tpu.config import GBDTConfig
from mmtrs_tpu.data import build_features
from mmtrs_tpu.models.gbdt import (
    Forest,
    consensus_sample_weights,
    fit_bins,
    apply_bins,
    predict_proba,
    predict_raw,
    train_gbdt,
)
from mmtrs_tpu.metrics import roc_auc
from tests.synth import synth_standardized


@pytest.fixture(scope="module")
def tab_data():
    df = synth_standardized(422, seed=11)
    X = build_features(df).to_numpy().astype(np.float32)
    y = df["y_majority"].astype(int).to_numpy()
    p = df["p_indirect"].to_numpy().astype(np.float32)
    w = df["weight"].to_numpy().astype(np.float32)
    tr = (df["split"] == "train").to_numpy()
    return X[tr], y[tr], p[tr], w[tr], X[~tr], y[~tr], p[~tr]


def test_binning_roundtrip():
    X = np.array([[0.0, 5.0], [1.0, 5.0], [2.0, 5.0], [3.0, 5.0]], np.float32)
    spec = fit_bins(X, max_bins=4)
    b = apply_bins(X, spec)
    assert (b[:, 0] == np.array([0, 1, 2, 3])).all()
    assert (b[:, 1] == 0).all()  # constant feature → single bin


def test_classifier_learns(tab_data):
    Xtr, ytr, _, wtr, Xte, yte, _ = tab_data
    cfg = GBDTConfig(n_estimators=200, max_depth=3, learning_rate=0.1)
    sw = consensus_sample_weights(wtr, ytr, cfg.consensus_power, cfg.class_balanced)
    f = train_gbdt(Xtr, ytr, cfg, sample_weight=sw)
    auc = roc_auc(yte, predict_proba(f, Xte))
    assert auc > 0.80, auc


def test_quality_close_to_sklearn_hgb(tab_data):
    from sklearn.ensemble import HistGradientBoostingClassifier

    Xtr, ytr, _, _, Xte, yte, _ = tab_data
    skl = HistGradientBoostingClassifier(
        max_iter=200, learning_rate=0.1, max_depth=3, random_state=0
    ).fit(Xtr, ytr)
    auc_skl = roc_auc(yte, skl.predict_proba(Xte)[:, 1])

    cfg = GBDTConfig(n_estimators=200, max_depth=3, learning_rate=0.1,
                     gamma=0.0, min_child_weight=1.0, subsample=1.0, colsample=1.0)
    f = train_gbdt(Xtr, ytr, cfg)
    auc_jax = roc_auc(yte, predict_proba(f, Xte))
    assert auc_jax > auc_skl - 0.02, (auc_jax, auc_skl)


def test_soft_regression_objective(tab_data):
    Xtr, _, ptr, wtr, Xte, yte, pte = tab_data
    cfg = GBDTConfig.lgbm_like()
    cfg = GBDTConfig(**{**cfg.__dict__, "n_estimators": 300})
    sw = consensus_sample_weights(wtr, (ptr >= 0.5).astype(int), 0.5, False)
    f = train_gbdt(Xtr, np.clip(ptr, 1e-3, 1 - 1e-3), cfg, sample_weight=sw)
    pred = predict_proba(f, Xte)
    assert ((pred >= 0) & (pred <= 1)).all()
    mse = float(np.mean((pred - pte) ** 2))
    assert mse < np.mean((pte.mean() - pte) ** 2), mse  # beats constant
    # probability ranking should still discriminate the hard label
    assert roc_auc(yte, pred) > 0.78


def test_early_stopping_prefix(tab_data):
    Xtr, ytr, _, _, Xte, yte, _ = tab_data
    n_val = 80
    cfg = GBDTConfig(n_estimators=400, max_depth=3, learning_rate=0.3,
                     early_stopping_rounds=50, subsample=1.0, colsample=1.0)
    f = train_gbdt(Xtr[n_val:], ytr[n_val:], cfg, X_val=Xtr[:n_val], y_val=ytr[:n_val])
    assert f.val_history is not None and f.val_history.shape == (400,)
    assert f.n_trees_used == int(np.argmin(f.val_history)) + 1
    assert f.n_trees_used < 400  # lr 0.3 must overfit well before 400 trees


def test_determinism(tab_data):
    Xtr, ytr, _, _, Xte, _, _ = tab_data
    cfg = GBDTConfig(n_estimators=50, max_depth=3, seed=7)
    p1 = predict_proba(train_gbdt(Xtr, ytr, cfg), Xte)
    p2 = predict_proba(train_gbdt(Xtr, ytr, cfg), Xte)
    np.testing.assert_array_equal(p1, p2)


def test_monotone_constraint_enforced():
    rng = np.random.default_rng(0)
    n = 800
    x0 = rng.integers(0, 5, n).astype(np.float32)
    x1 = rng.normal(size=n).astype(np.float32)
    # true relation: y increases with x0
    y = ((x0 + rng.normal(0, 2.0, n)) > 2).astype(int)
    X = np.c_[x0, x1]
    cfg = GBDTConfig(
        n_estimators=100, max_depth=3, learning_rate=0.1,
        monotone_constraints=(1, 0), subsample=1.0, colsample=1.0,
        gamma=0.0, min_child_weight=1.0,
    )
    f = train_gbdt(X, y, cfg)
    grid = np.stack([np.arange(5, dtype=np.float32), np.zeros(5, np.float32)], 1)
    pred = predict_raw(f, grid)
    assert (np.diff(pred) >= -1e-5).all(), pred


def test_save_load_roundtrip(tmp_path, tab_data):
    Xtr, ytr, _, _, Xte, _, _ = tab_data
    cfg = GBDTConfig(n_estimators=30, max_depth=3)
    f = train_gbdt(Xtr, ytr, cfg)
    f.save(tmp_path / "forest")
    g = Forest.load(tmp_path / "forest")
    np.testing.assert_allclose(predict_proba(f, Xte), predict_proba(g, Xte), atol=1e-7)


def test_consensus_weights_policy():
    w = np.array([1.0, 0.5, 0.0, 1.0])
    y = np.array([1, 1, 0, 0])
    sw = consensus_sample_weights(w, y, consensus_power=0.7, class_balanced=True)
    assert sw.mean() == pytest.approx(1.0, abs=1e-6)
    assert sw[2] == 0.0  # zero consensus stays zero
