"""Fusion layer: weight search, meta stacker, final stack, inference recipes."""

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.config import FusionConfig, GBDTConfig
from mmtrs_tpu.fusion import (
    MetaStacker,
    blended_prob,
    fit_fusion,
    fit_tab_oof,
    fuse_streams,
    grid_simplex,
    load_recipe,
    run_final_stack,
    run_tabular_stack,
    search_weights,
)
from mmtrs_tpu.metrics import roc_auc
from tests.synth import synth_standardized


@pytest.fixture(scope="module")
def cohort():
    df = synth_standardized(300, seed=21)
    return df


def _fake_streams(df, seed=0):
    """Correlated-but-noisy per-stream probabilities for each row."""
    rng = np.random.default_rng(seed)
    y = df["y_majority"].astype(int).to_numpy()
    mk = lambda noise: np.clip(
        0.5 + 0.35 * (y * 2 - 1) + rng.normal(0, noise, len(y)), 0.01, 0.99
    )
    return {"prob_mm": mk(0.25), "prob_mil": mk(0.3)}


def test_grid_simplex_properties():
    W = grid_simplex(3, step=0.1)
    assert np.allclose(W.sum(axis=1), 1.0)
    assert (W >= 0).all()
    assert len(W) == 66  # C(12,2) compositions of 10 into 3 parts


def test_search_weights_matches_naive(cohort):
    from mmtrs_tpu.metrics import evaluate, tune_threshold

    s = _fake_streams(cohort)
    P = np.stack([s["prob_mm"], s["prob_mil"]], axis=1)
    y = cohort["y_majority"].astype(int).to_numpy()
    got = search_weights(P, y, step=0.25)

    best = {"score": -1.0}
    for w in grid_simplex(2, 0.25):
        p = blended_prob(w, P)
        t, _ = tune_threshold(y, p, "f1")
        sc = evaluate(y, p, t)["f1"]
        if sc > best["score"]:
            best = {"weights": w.tolist(), "threshold": t, "score": sc}
    assert got["weights"] == best["weights"]
    assert got["threshold"] == pytest.approx(best["threshold"])
    assert got["score"] == pytest.approx(best["score"])


def test_meta_stacker_drops_noise_stream(cohort):
    rng = np.random.default_rng(3)
    y = cohort["y_majority"].astype(int).to_numpy()
    good = _fake_streams(cohort)["prob_mm"]
    noise = rng.random(len(y))
    P = np.stack([good, noise], axis=1)
    st = MetaStacker(C=1.0).fit(P, y)
    w = st.weights_
    assert w[0] > 0.9  # informative stream dominates
    assert roc_auc(y, st.predict_proba(P)) > 0.8


def test_fit_tab_oof_shapes_and_quality(cohort):
    cfg = GBDTConfig(**{**GBDTConfig.stack_tab_like().__dict__, "n_estimators": 150})
    oof, te = fit_tab_oof(cohort, folds=5, cfg=cfg)
    n_tv = (cohort["split"].isin(["train", "val"])).sum()
    assert len(oof) == n_tv and len(te) == (cohort["split"] == "test").sum()
    assert {"image_name", "y", "prob"} <= set(oof.columns)
    assert roc_auc(oof["y"], oof["prob"]) > 0.75
    assert roc_auc(te["y"], te["prob"]) > 0.75


def test_run_final_stack_end_to_end(tmp_path, cohort):
    s = _fake_streams(cohort)
    tv = cohort[cohort["split"].isin(["train", "val"])].reset_index(drop=True)
    te = cohort[cohort["split"] == "test"].reset_index(drop=True)
    mk = lambda d, p: pd.DataFrame(
        {"image_name": d["image_name"], "y": d["y_majority"].astype(int), "prob": p}
    )
    idx_tv = cohort["split"].isin(["train", "val"]).to_numpy()
    oof_mm = mk(tv, s["prob_mm"][idx_tv])
    pred_mm = mk(te, s["prob_mm"][~idx_tv])
    oof_mil = mk(tv, s["prob_mil"][idx_tv])
    pred_mil = mk(te, s["prob_mil"][~idx_tv])

    cfg = FusionConfig(thr_mode="max_f1")
    tab_cfg = GBDTConfig(**{**GBDTConfig.stack_tab_like().__dict__, "n_estimators": 150})
    summary = run_final_stack(
        cohort, oof_mm, pred_mm, oof_mil, pred_mil, outdir=tmp_path,
        cfg=cfg, tab_cfg=tab_cfg,
    )
    assert summary["features"] == ["prob_tab", "prob_mm", "prob_mil"]
    # stack should beat or match the best single stream on OOF
    best_single = max(
        roc_auc(oof_mm["y"], oof_mm["prob"]), roc_auc(oof_mil["y"], oof_mil["prob"])
    )
    assert summary["oof"]["auc"] >= best_single - 0.01
    assert summary["test"]["auc"] > 0.8
    # artifact trio written with the reference schema
    for f in ("stack_oof.csv", "stack_test.csv", "summary.json"):
        assert (tmp_path / f).exists()
    oof_csv = pd.read_csv(tmp_path / "stack_oof.csv")
    assert list(oof_csv.columns) == ["image_name", "y", "prob"]


def test_run_tabular_stack(tmp_path, cohort):
    # lighter configs for test speed
    import mmtrs_tpu.fusion.stack as stack_mod

    summary = run_tabular_stack(cohort, outdir=tmp_path, n_folds=3)
    assert summary["test"]["auc"] > 0.7
    assert (tmp_path / "stack_test_predictions.csv").exists()
    cols = pd.read_csv(tmp_path / "stack_test_predictions.csv").columns
    assert list(cols) == ["y_true", "score_prob_indirect", "y_pred"]


def test_fit_fusion_and_recipe_roundtrip(tmp_path, cohort):
    s = _fake_streams(cohort)
    y = cohort["y_majority"].astype(int).to_numpy()
    half = len(y) // 2
    sv = {"v_hard": s["prob_mm"][:half], "xgb": s["prob_mil"][:half]}
    st = {"v_hard": s["prob_mm"][half:], "xgb": s["prob_mil"][half:]}
    meta = fit_fusion(sv, y[:half], st, y[half:], out_dir=tmp_path)
    assert meta["choice"] in ("blend", "stack")
    assert (tmp_path / "fusion_summary.json").exists()
    assert (tmp_path / "P_val.npy").exists()

    rec = load_recipe(tmp_path)
    assert rec["streams_used"] == ["v_hard", "xgb"]
    out = fuse_streams(rec, {"v_hard": 0.9, "xgb": 0.8})
    assert out["label"] in ("Direct", "Indirect")
    assert set(out["weights_used"]) <= {"v_hard", "xgb"}
    # masked stream: only one present → weights not renormalized (reference behavior)
    out2 = fuse_streams(rec, {"v_hard": 0.9})
    assert out2["streams_used"] == ["v_hard"]
    with pytest.raises(RuntimeError):
        fuse_streams(rec, {})


def test_golden_two_stream_stack_on_reference_csvs(reference_root):
    """Fit our meta-LR on the reference's real MM+MIL OOF streams and verify
    the fused test AUC lands at/above the best single stream — machinery-level
    golden check using real committed predictions."""
    mm_oof = pd.read_csv(reference_root / "weights/mm_dualtask_v1/finalized/oof_val.csv")
    mm_te = pd.read_csv(reference_root / "weights/mm_dualtask_v1/finalized/pred_test.csv")
    mil_oof = pd.read_csv(reference_root / "weights/mil_v1/oof_val.csv")
    mil_te = pd.read_csv(reference_root / "weights/mil_v1/pred_test.csv")

    oof = mm_oof.rename(columns={"prob": "prob_mm"}).merge(
        mil_oof.rename(columns={"prob": "prob_mil"}), on=["image_name", "y"], how="inner"
    )
    te = mm_te.rename(columns={"prob": "prob_mm"}).merge(
        mil_te.rename(columns={"prob": "prob_mil"}), on=["image_name", "y"], how="inner"
    )
    from mmtrs_tpu.models.linear import LogisticRegression

    meta = LogisticRegression(penalty="l2", max_iter=1000)
    meta.fit(oof[["prob_mm", "prob_mil"]].to_numpy(), oof["y"].astype(int).to_numpy())
    p_te = meta.predict_proba(te[["prob_mm", "prob_mil"]].to_numpy())[:, 1]
    auc_fused = roc_auc(te["y"], p_te)
    auc_mm = roc_auc(te["y"], te["prob_mm"])
    auc_mil = roc_auc(te["y"], te["prob_mil"])
    assert auc_fused >= max(auc_mm, auc_mil) - 0.005
    assert auc_fused > 0.80
