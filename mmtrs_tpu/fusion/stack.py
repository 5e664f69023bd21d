"""Late-fusion stacking — the headline system.

Parity targets:
- ``run_final_stack``: experiments/fusion_v1/stack_blend.py:94-288 — per-fold
  tabular GBDT OOF on 2 continuous + 7 categorical raw features with
  constant-feature dropping, inner-join with precomputed MM (+ optional MIL)
  prediction CSVs on (image_name, y), LogisticRegression meta on the stream
  probabilities, OOF threshold selection, and the stack_oof.csv /
  stack_test.csv / summary.json artifact trio that carries the published
  Test AUC 0.8695 / Acc 0.8223.
- ``run_tabular_stack``: models/stack_blend.py:149-210 — 5-fold
  StratifiedKFold OOF of the XGB-like classifier + LGBM-like soft regressor,
  balanced logistic meta, OOF threshold grid, fold-averaged test preds.

All tree/linear compute is the JAX GBDT / logistic from mmtrs_tpu.models.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from mmtrs_tpu.config import FusionConfig, GBDTConfig
from mmtrs_tpu.data.features import BASE_FEATURES, build_features
from mmtrs_tpu.data.splits import group_kfold, stratified_kfold
from mmtrs_tpu.metrics import choose_threshold
from mmtrs_tpu.metrics.binary import summary_payload
from mmtrs_tpu.metrics.thresholds import threshold_grid, sweep_thresholds
from mmtrs_tpu.models.gbdt import consensus_sample_weights, predict_proba, train_gbdt
from mmtrs_tpu.models.linear import LogisticRegression
from mmtrs_tpu.utils.io import save_json

# stack_blend.py:88-92 — raw-feature view used by the final tab stream
CONT_ALL = ["depth", "width"]
CAT_ALL = [
    "enamel_cracks",
    "occlusal_load",
    "carious_lesion",
    "opposing_type",
    "adjacent_teeth",
    "age_range",
    "cervical_lesion",
]


def fit_tab_oof(
    df_tab: pd.DataFrame,
    folds: int = 5,
    cfg: GBDTConfig | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """GroupKFold OOF + fold-averaged test predictions of the tabular stream
    (stack_blend.py:94-191). Returns (oof_df, test_df) with columns
    image_name, y, prob."""
    cfg = cfg or GBDTConfig.stack_tab_like()
    assert "split" in df_tab.columns and "y_majority" in df_tab.columns
    df = df_tab.copy()
    for c in CONT_ALL + CAT_ALL:
        if c not in df.columns:
            df[c] = np.nan

    df[CONT_ALL] = df[CONT_ALL].astype(float)
    df[CONT_ALL] = df[CONT_ALL].fillna(df[CONT_ALL].median(numeric_only=True))
    for c in CAT_ALL:
        df[c] = pd.to_numeric(df[c], errors="coerce").fillna(-1).astype("int64")

    # drop constant features (stack_blend.py:111-117)
    feats = [c for c in CONT_ALL + CAT_ALL if df[c].nunique() > 1]

    df_tv = df[df["split"].isin(["train", "val"])].reset_index(drop=True)
    df_te = df[df["split"] == "test"].reset_index(drop=True)
    if "origin_id" in df_tv.columns:
        group_col = "origin_id"
    elif "image_id" in df_tv.columns:
        group_col = "image_id"
    else:
        df_tv["__grp"] = np.arange(len(df_tv))
        group_col = "__grp"

    X_tv = df_tv[feats].to_numpy(dtype=np.float32)
    y_tv = df_tv["y_majority"].astype(int).to_numpy()
    X_te = df_te[feats].to_numpy(dtype=np.float32)

    oof = np.zeros(len(df_tv))
    test_pred = np.zeros(len(df_te))
    for tr, va in group_kfold(df_tv, folds, group_col):
        sw = consensus_sample_weights(
            np.ones(len(tr)), y_tv[tr], consensus_power=0.0,
            class_balanced=cfg.class_balanced,
        )
        f = train_gbdt(
            X_tv[tr], y_tv[tr], cfg, sample_weight=sw,
            X_val=X_tv[va], y_val=y_tv[va],
        )
        oof[va] = predict_proba(f, X_tv[va])
        if len(df_te):
            test_pred += predict_proba(f, X_te) / folds

    oof_df = df_tv[["image_name", "y_majority"]].rename(columns={"y_majority": "y"})
    oof_df = oof_df.assign(prob=oof)
    te_df = df_te[["image_name", "y_majority"]].rename(columns={"y_majority": "y"})
    te_df = te_df.assign(prob=test_pred)
    return oof_df, te_df


def run_final_stack(
    df_tab: pd.DataFrame,
    oof_mm: pd.DataFrame,
    pred_mm: pd.DataFrame,
    oof_mil: pd.DataFrame | None = None,
    pred_mil: pd.DataFrame | None = None,
    outdir: str | Path | None = None,
    cfg: FusionConfig = FusionConfig(),
    tab_cfg: GBDTConfig | None = None,
) -> dict:
    """The headline pipeline (stack_blend.py:195-288). Returns the summary
    dict; writes stack_oof.csv / stack_test.csv / summary.json if outdir."""
    tab_oof, tab_test = fit_tab_oof(df_tab, folds=cfg.n_folds, cfg=tab_cfg)
    tab_oof = tab_oof.rename(columns={"prob": "prob_tab"})
    tab_test = tab_test.rename(columns={"prob": "prob_tab"})

    mm_oof = oof_mm.rename(columns={"prob": "prob_mm"})
    mm_te = pred_mm.rename(columns={"prob": "prob_mm"})
    oof = tab_oof.merge(mm_oof, on=["image_name", "y"], how="inner")
    test = tab_test.merge(mm_te, on=["image_name", "y"], how="inner")

    use_mil = oof_mil is not None and pred_mil is not None
    if use_mil:
        oof = oof.merge(
            oof_mil.rename(columns={"prob": "prob_mil"}), on=["image_name", "y"], how="inner"
        )
        test = test.merge(
            pred_mil.rename(columns={"prob": "prob_mil"}), on=["image_name", "y"], how="inner"
        )

    feat_cols = ["prob_tab", "prob_mm"] + (["prob_mil"] if use_mil else [])
    X_oof = oof[feat_cols].to_numpy(dtype=float)
    y_oof = oof["y"].astype(int).to_numpy()

    meta = LogisticRegression(penalty="l2", C=1.0, max_iter=cfg.meta_max_iter)
    meta.fit(X_oof, y_oof)
    p_oof = meta.predict_proba(X_oof)[:, 1]
    thr = choose_threshold(y_oof, p_oof, mode=cfg.thr_mode, target=cfg.thr_target)

    p_te = meta.predict_proba(test[feat_cols].to_numpy(dtype=float))[:, 1]
    y_te = test["y"].astype(int).to_numpy()

    summary = {
        "oof": summary_payload(y_oof, p_oof, thr),
        "test": summary_payload(y_te, p_te, thr),
        "thr": float(np.round(thr, 4)),
        "thr_mode": cfg.thr_mode,
        "thr_target": cfg.thr_target,
        "features": feat_cols,
        "meta_coef": meta.coef_.tolist(),
        "meta_intercept": meta.intercept_,
    }

    if outdir is not None:
        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        oof_out = oof[["image_name", "y"]].assign(prob=p_oof)
        te_out = test[["image_name", "y"]].assign(prob=p_te)
        oof_out.to_csv(outdir / "stack_oof.csv", index=False)
        te_out.to_csv(outdir / "stack_test.csv", index=False)
        save_json(summary, outdir / "summary.json")
    return summary


def run_tabular_stack(
    df: pd.DataFrame,
    outdir: str | Path | None = None,
    n_folds: int = 5,
    seed: int = 42,
    thr_metric: str = "accuracy",
) -> dict:
    """Tabular-only stack (models/stack_blend.py:149-210): StratifiedKFold OOF
    of XGB-like + LGBM-like streams → balanced logistic meta → OOF threshold
    grid → fold-averaged test predictions."""
    feats = build_features(df)
    X = feats.to_numpy(dtype=np.float32)
    y = df["y_majority"].astype(int).to_numpy()
    p_soft = np.clip(df["p_indirect"].to_numpy(dtype=np.float32), 1e-3, 1 - 1e-3)
    w = df["weight"].to_numpy(dtype=np.float32)
    is_tr = (df["split"] == "train").to_numpy()

    Xtr, ytr, ptr, wtr = X[is_tr], y[is_tr], p_soft[is_tr], w[is_tr]
    Xte, yte = X[~is_tr], y[~is_tr]

    xgb_cfg = GBDTConfig()
    lgb_cfg = GBDTConfig.lgbm_like()

    oof = np.zeros((len(Xtr), 2))
    test_pred = np.zeros((len(Xte), 2))
    for tr, va in stratified_kfold(ytr, n_folds, seed):
        sw_x = consensus_sample_weights(wtr[tr], ytr[tr], xgb_cfg.consensus_power, True)
        fx = train_gbdt(Xtr[tr], ytr[tr], xgb_cfg, sample_weight=sw_x,
                        X_val=Xtr[va], y_val=ytr[va])
        sw_l = consensus_sample_weights(wtr[tr], ytr[tr], lgb_cfg.consensus_power, False)
        fl = train_gbdt(Xtr[tr], ptr[tr], lgb_cfg, sample_weight=sw_l,
                        X_val=Xtr[va], y_val=ptr[va])
        oof[va, 0] = predict_proba(fx, Xtr[va])
        oof[va, 1] = predict_proba(fl, Xtr[va])
        test_pred[:, 0] += predict_proba(fx, Xte) / n_folds
        test_pred[:, 1] += predict_proba(fl, Xte) / n_folds

    meta = LogisticRegression(penalty="l2", class_weight="balanced", max_iter=1000)
    meta.fit(oof, ytr)
    p_oof = meta.predict_proba(oof)[:, 1]
    ts = threshold_grid("fusion")
    s = sweep_thresholds(ytr, p_oof, ts)
    key = {"f1": "f1", "accuracy": "acc", "balanced_accuracy": "bal_acc"}[thr_metric]
    thr = float(ts[int(np.argmax(s[key]))])

    p_te = meta.predict_proba(test_pred)[:, 1]
    summary = {
        "oof": summary_payload(ytr, p_oof, thr),
        "test": summary_payload(yte, p_te, thr),
        "thr": round(thr, 4),
        "streams": ["xgb", "lgbm"],
        "meta_coef": meta.coef_.tolist(),
    }
    if outdir is not None:
        outdir = Path(outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(
            {"y_true": yte, "score_prob_indirect": p_te, "y_pred": (p_te >= thr).astype(int)}
        ).to_csv(outdir / "stack_test_predictions.csv", index=False)
        save_json({"threshold": thr}, outdir / "stack_params.json")
        save_json(summary, outdir / "metrics_stack.json")
    return summary
