"""Tabular trainers — XGBoost/LightGBM recipe parity on the JAX GBDT.

- :func:`train_xgb_like`  (models/xgboost_model.py:103-199): train-split
  only, optional min-consensus row drop, consensus^0.7 × balanced class
  weights, stratified 80/20 val, binary classifier with early stopping,
  sigmoid/isotonic calibration on val, accuracy-tuned threshold grid;
  artifacts metrics_xgb.json / xgb_threshold.json / xgb_test_predictions.csv.
- :func:`train_lgbm_like` (models/lightgbm_model.py:59-126): regression on
  p_indirect clipped to (1e-3, 1-1e-3), consensus^0.5 weights, early stop on
  L2; clip-to-[0,1] probability wrapper.
- :func:`train_tab_kfold` — the UI TabEnsemble's missing trainer
  (weights/tab_v1/tab_fold*.pkl has no in-repo trainer; ui/gradio_app/
  README.md:12 describes a LightGBM k-fold — added here per SURVEY.md quirks).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedShuffleSplit

from mmtrs_tpu.config import GBDTConfig
from mmtrs_tpu.data.features import (
    ALL_FEATURES,
    DEFAULT_MONOTONE,
    LABEL_HARD,
    LABEL_SOFT,
    SAMPLE_WEIGHT,
    build_features,
)
from mmtrs_tpu.data.splits import group_kfold
from mmtrs_tpu.metrics import binary_report, tune_threshold
from mmtrs_tpu.models.gbdt import (
    Forest,
    consensus_sample_weights,
    predict_proba,
    predict_raw,
    train_gbdt,
)
from mmtrs_tpu.models.linear import make_calibrator
from mmtrs_tpu.utils.io import save_json


def _train_frame(df: pd.DataFrame) -> pd.DataFrame:
    return df[df["split"].astype(str).str.lower() == "train"]


def train_xgb_like(
    df: pd.DataFrame,
    outdir: str | Path | None = None,
    cfg: GBDTConfig | None = None,
    min_weight: float = 0.0,
    calibration: str = "sigmoid",
    thr_metric: str = "accuracy",
    monotone: bool = False,
    seed: int = 42,
) -> dict:
    cfg = cfg or GBDTConfig(
        monotone_constraints=DEFAULT_MONOTONE + (0,) * 7 if monotone else None
    )
    tr = _train_frame(df)
    if min_weight > 0:  # drop low-consensus rows (:121-125)
        tr = tr[tr[SAMPLE_WEIGHT] >= min_weight]
    X = build_features(tr).to_numpy(np.float32)
    y = tr[LABEL_HARD].astype(int).to_numpy()
    w = consensus_sample_weights(
        tr[SAMPLE_WEIGHT].to_numpy(), y, cfg.consensus_power, cfg.class_balanced
    )
    # stratified 80/20 val (:138-140)
    sss = StratifiedShuffleSplit(1, test_size=0.2, random_state=seed)
    tr_i, va_i = next(sss.split(X, y))
    forest = train_gbdt(
        X[tr_i], y[tr_i], cfg, sample_weight=w[tr_i],
        X_val=X[va_i], y_val=y[va_i],
    )
    cal = make_calibrator(calibration, predict_proba(forest, X[va_i]), y[va_i])
    p_val = np.clip(cal.transform(predict_proba(forest, X[va_i])), 0, 1)
    thr, _ = tune_threshold(y[va_i], p_val, thr_metric)

    result = {"forest": forest, "calibrator": cal, "thr": thr}
    te = df[df["split"].astype(str).str.lower() == "test"]
    if len(te):
        Xte = build_features(te).to_numpy(np.float32)
        yte = te[LABEL_HARD].astype(int).to_numpy()
        p_te = np.clip(cal.transform(predict_proba(forest, Xte)), 0, 1)
        rep = binary_report(yte, p_te, thr)
        result["test_metrics"] = rep
        if outdir is not None:
            outdir = Path(outdir)
            outdir.mkdir(parents=True, exist_ok=True)
            forest.save(outdir / "xgb_forest")
            save_json({"threshold": thr, "metric": thr_metric}, outdir / "xgb_threshold.json")
            save_json(
                {k: rep[k] for k in ("auc", "acc", "prec", "rec", "f1", "brier")},
                outdir / "metrics_xgb.json",
            )
            pd.DataFrame(
                {"y_true": yte, "score_prob_indirect": p_te,
                 "y_pred": (p_te >= thr).astype(int)}
            ).to_csv(outdir / "xgb_test_predictions.csv", index=False)
    return result


def train_lgbm_like(
    df: pd.DataFrame,
    outdir: str | Path | None = None,
    cfg: GBDTConfig | None = None,
    seed: int = 42,
) -> dict:
    cfg = cfg or GBDTConfig.lgbm_like()
    tr = _train_frame(df)
    X = build_features(tr).to_numpy(np.float32)
    y = tr[LABEL_HARD].astype(int).to_numpy()
    p = np.clip(tr[LABEL_SOFT].to_numpy(np.float32), 1e-3, 1 - 1e-3)  # (:79-80)
    w = consensus_sample_weights(
        tr[SAMPLE_WEIGHT].to_numpy(), y, cfg.consensus_power, cfg.class_balanced
    )
    sss = StratifiedShuffleSplit(1, test_size=0.2, random_state=seed)
    tr_i, va_i = next(sss.split(X, y))
    forest = train_gbdt(
        X[tr_i], p[tr_i], cfg, sample_weight=w[tr_i],
        X_val=X[va_i], y_val=p[va_i],
    )
    result = {"forest": forest}
    te = df[df["split"].astype(str).str.lower() == "test"]
    if len(te):
        Xte = build_features(te).to_numpy(np.float32)
        yte = te[LABEL_HARD].astype(int).to_numpy()
        p_te = predict_proba(forest, Xte)  # clipped [0,1] (LGBMProbWrapper)
        rep = binary_report(yte, p_te, 0.5)
        result["test_metrics"] = rep
        if outdir is not None:
            outdir = Path(outdir)
            outdir.mkdir(parents=True, exist_ok=True)
            forest.save(outdir / "lgbm_forest")
            save_json(
                {k: rep[k] for k in ("auc", "acc", "prec", "rec", "f1", "brier")},
                outdir / "metrics_lgbm.json",
            )
            pd.DataFrame(
                {"y_true": yte, "score_prob_indirect": p_te,
                 "y_pred": (p_te >= 0.5).astype(int)}
            ).to_csv(outdir / "lgbm_test_predictions.csv", index=False)
    return result


def train_tab_kfold(
    df: pd.DataFrame,
    outdir: str | Path | None = None,
    n_folds: int = 5,
    cfg: GBDTConfig | None = None,
) -> dict:
    """The UI TabEnsemble trainer the reference never shipped: k-fold
    GBDT classifiers on the raw features; per-fold forests saved as
    tab_fold{k}; serving averages fold probabilities (tab_model.py:90-122)."""
    cfg = cfg or GBDTConfig.stack_tab_like()
    tv = df[df["split"].astype(str).str.lower().isin(["train", "val"])].reset_index(drop=True)
    X = build_features(tv).to_numpy(np.float32)
    y = tv[LABEL_HARD].astype(int).to_numpy()
    group_col = "origin_id" if "origin_id" in tv.columns else None
    if group_col is None:
        tv = tv.assign(origin_id=np.arange(len(tv)))
    forests = []
    for fold, (tr, va) in enumerate(group_kfold(tv, n_folds)):
        f = train_gbdt(X[tr], y[tr], cfg, X_val=X[va], y_val=y[va])
        forests.append(f)
        if outdir is not None:
            Path(outdir).mkdir(parents=True, exist_ok=True)
            f.save(Path(outdir) / f"tab_fold{fold}")
    return {"forests": forests}


def predict_tab_ensemble(forests: list[Forest], df: pd.DataFrame) -> np.ndarray:
    X = build_features(df).to_numpy(np.float32)
    return np.mean([predict_proba(f, X) for f in forests], axis=0)


def load_tab_ensemble(folder: str | Path) -> list[Forest]:
    folder = Path(folder)
    forests = []
    for p in sorted(folder.glob("tab_fold*.npz")):
        forests.append(Forest.load(p.with_suffix("")))
    return forests
