#!/usr/bin/env python3
"""Tabular GBDT quality audit at reference scale (VERDICT round-2 item 8).

Runs the JAX histogram GBDT path (xgb-like classifier, lgbm-like soft
regressor, tabular stack — mmtrs_tpu/models/gbdt.py, train/tabular.py,
fusion/stack.py) on a 422-row synthetic standardized cohort against
sklearn's HistGradientBoosting equivalents (lightgbm/xgboost wheels are not
installed here; HGB is sklearn's LightGBM-class implementation) on the SAME
features and split, and writes the comparison to reports/gbdt_audit.json.

Reference numbers for scale (private clinical data, not reproducible here):
/root/reference/models/outputs/metrics_lgbm.json AUC 0.7967,
metrics_xgb.json AUC 0.6911.

Run: JAX_PLATFORMS=cpu python scripts/gbdt_audit.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def run_audit() -> dict:
    """Train both stacks on the same cohort and return the comparison dict
    (importable so tests can pin the quality bar as a regression check)."""
    from sklearn.ensemble import (
        HistGradientBoostingClassifier,
        HistGradientBoostingRegressor,
    )
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import StratifiedKFold

    from mmtrs_tpu.data.features import build_features
    from mmtrs_tpu.fusion.stack import run_tabular_stack
    from mmtrs_tpu.metrics import roc_auc
    from mmtrs_tpu.train.tabular import train_lgbm_like, train_xgb_like
    from tests.synth import synth_standardized

    df = synth_standardized(422, seed=20)
    X = build_features(df).to_numpy(np.float32)
    y = df["y_majority"].astype(int).to_numpy()
    p_soft = df["p_indirect"].to_numpy(np.float32)
    is_tr = (df["split"] == "train").to_numpy()
    Xtr, ytr, ptr = X[is_tr], y[is_tr], p_soft[is_tr]
    Xte, yte = X[~is_tr], y[~is_tr]

    rep: dict = {"n": int(len(df)), "n_test": int(len(Xte)), "seed": 20}

    # ---- ours ------------------------------------------------------------
    ours_xgb = train_xgb_like(df)["test_metrics"]
    ours_lgb = train_lgbm_like(df)["test_metrics"]
    stack = run_tabular_stack(df)
    rep["ours"] = {
        "xgb_like_auc": ours_xgb["auc"],
        "lgbm_like_auc": ours_lgb["auc"],
        "stack_auc": stack["test"]["auc"],
    }

    # ---- sklearn baselines (same features/split) --------------------------
    hgb_c = HistGradientBoostingClassifier(
        max_iter=400, learning_rate=0.05, max_leaf_nodes=31, random_state=0
    ).fit(Xtr, ytr)
    p_c = hgb_c.predict_proba(Xte)[:, 1]
    hgb_r = HistGradientBoostingRegressor(
        max_iter=400, learning_rate=0.05, max_leaf_nodes=31, random_state=0
    ).fit(Xtr, np.clip(ptr, 1e-3, 1 - 1e-3))
    p_r = np.clip(hgb_r.predict(Xte), 0, 1)

    # 5-fold OOF stack of the two sklearn streams (mirrors run_tabular_stack)
    skf = StratifiedKFold(5, shuffle=True, random_state=42)
    oof = np.zeros((len(Xtr), 2))
    te_pred = np.zeros((len(Xte), 2))
    for tr_i, va_i in skf.split(Xtr, ytr):
        c = HistGradientBoostingClassifier(
            max_iter=400, learning_rate=0.05, max_leaf_nodes=31, random_state=0
        ).fit(Xtr[tr_i], ytr[tr_i])
        r = HistGradientBoostingRegressor(
            max_iter=400, learning_rate=0.05, max_leaf_nodes=31, random_state=0
        ).fit(Xtr[tr_i], np.clip(ptr[tr_i], 1e-3, 1 - 1e-3))
        oof[va_i, 0] = c.predict_proba(Xtr[va_i])[:, 1]
        oof[va_i, 1] = np.clip(r.predict(Xtr[va_i]), 0, 1)
        te_pred[:, 0] += c.predict_proba(Xte)[:, 1] / 5
        te_pred[:, 1] += np.clip(r.predict(Xte), 0, 1) / 5
    meta = LogisticRegression(class_weight="balanced", solver="liblinear").fit(
        oof, ytr
    )
    p_stack = meta.predict_proba(te_pred)[:, 1]

    rep["sklearn"] = {
        "hgb_classifier_auc": float(roc_auc(yte, p_c)),
        "hgb_regressor_auc": float(roc_auc(yte, p_r)),
        "hgb_stack_auc": float(roc_auc(yte, p_stack)),
    }
    rep["delta"] = {
        "classifier": rep["ours"]["xgb_like_auc"] - rep["sklearn"]["hgb_classifier_auc"],
        "regressor": rep["ours"]["lgbm_like_auc"] - rep["sklearn"]["hgb_regressor_auc"],
        "stack": rep["ours"]["stack_auc"] - rep["sklearn"]["hgb_stack_auc"],
    }
    # Direction-aware verdict: the JAX forest must not lose to sklearn HGB
    # by more than one noise margin (AUC se ≈ 0.06 on an 80-row test split);
    # winning by more than noise is "above_baseline", not "within noise".
    worst = min(rep["delta"].values())
    best = max(rep["delta"].values())
    rep["verdict"] = (
        "above_baseline"
        if worst >= -0.01 and best > 0.06
        else "at_or_above_baseline"
        if worst >= -0.01
        else "below_baseline"
    )
    rep["verdict_note"] = (
        "deltas are (JAX forest − sklearn HistGradientBoosting) test AUC on "
        "the same 422-row cohort/split; xgboost/lightgbm wheels are not "
        "installed in this environment, so sklearn HGB is the only live "
        "baseline compared"
    )
    return rep


def main() -> int:
    rep = run_audit()
    out = REPO / "reports" / "gbdt_audit.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rep, indent=2, default=float))
    print(json.dumps(rep, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
