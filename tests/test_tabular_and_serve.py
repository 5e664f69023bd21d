"""Tabular trainer recipes + serving service/stacker contracts."""

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.config import GBDTConfig
from mmtrs_tpu.serve.choices import (
    CHOICES_MAP,
    encode_fields,
    validate_all_or_none,
    FIELD_ORDER,
)
from mmtrs_tpu.serve.service import PredictService, Stacker
from tests.synth import synth_images, synth_standardized


@pytest.fixture(scope="module")
def cohort():
    return synth_standardized(260, seed=31)


def _light(cfg: GBDTConfig, n=120) -> GBDTConfig:
    return GBDTConfig(**{**cfg.__dict__, "n_estimators": n})


def test_train_xgb_like_artifacts(tmp_path, cohort):
    from mmtrs_tpu.train.tabular import train_xgb_like

    out = train_xgb_like(cohort, outdir=tmp_path, cfg=_light(GBDTConfig()))
    assert out["test_metrics"]["auc"] > 0.7
    for f in ("xgb_threshold.json", "metrics_xgb.json", "xgb_test_predictions.csv",
              "xgb_forest.npz"):
        assert (tmp_path / f).exists(), f
    preds = pd.read_csv(tmp_path / "xgb_test_predictions.csv")
    assert list(preds.columns) == ["y_true", "score_prob_indirect", "y_pred"]


def test_train_lgbm_like_artifacts(tmp_path, cohort):
    from mmtrs_tpu.train.tabular import train_lgbm_like

    out = train_lgbm_like(
        cohort, outdir=tmp_path, cfg=_light(GBDTConfig.lgbm_like(), n=400)
    )
    assert out["test_metrics"]["auc"] > 0.7
    assert (tmp_path / "metrics_lgbm.json").exists()


def test_tab_kfold_ensemble(tmp_path, cohort):
    from mmtrs_tpu.metrics import roc_auc
    from mmtrs_tpu.train.tabular import (
        load_tab_ensemble,
        predict_tab_ensemble,
        train_tab_kfold,
    )

    out = train_tab_kfold(cohort, outdir=tmp_path, n_folds=3,
                          cfg=_light(GBDTConfig.stack_tab_like()))
    assert len(out["forests"]) == 3
    loaded = load_tab_ensemble(tmp_path)
    assert len(loaded) == 3
    te = cohort[cohort["split"] == "test"]
    p = predict_tab_ensemble(loaded, te)
    assert roc_auc(te["y_majority"].astype(int), p) > 0.7


# --------------------------- serve -------------------------------------------


def test_choices_consistent_with_standardizer():
    from mmtrs_tpu.data.standardize import FIELD_MAPPERS

    assert list(CHOICES_MAP) == list(FIELD_MAPPERS)
    # encodings round-trip through the standardizer for yes/no fields
    from mmtrs_tpu.data.standardize import map_yes_no

    assert CHOICES_MAP["enamel_cracks"]["Yes"] == map_yes_no("Yes")
    assert CHOICES_MAP["carious_lesion"]["Low risk"] == -1


def test_all_or_none_contract():
    full = {k: list(v)[0] for k, v in CHOICES_MAP.items()}
    ok, missing = validate_all_or_none(full)
    assert ok and not missing
    none = {k: None for k in CHOICES_MAP}
    ok, missing = validate_all_or_none(none)
    assert not ok and not missing
    partial = dict(none, depth="≤ 4mm")
    ok, missing = validate_all_or_none(partial)
    assert not ok and len(missing) == len(FIELD_ORDER) - 1


def test_encode_fields_order():
    full = {k: list(v)[1 % len(v)] for k, v in CHOICES_MAP.items()}
    vec = encode_fields(full)
    assert len(vec) == 9


def test_stacker_fuse_modes():
    rng = np.random.default_rng(0)
    n = 120
    y = (rng.random(n) < 0.5).astype(int)
    mk = lambda noise: np.clip(0.5 + 0.3 * (2 * y - 1) + rng.normal(0, noise, n), 0.01, 0.99)
    names = [f"{i}.jpg" for i in range(n)]
    df = lambda p: pd.DataFrame({"image_name": names, "y": y, "prob": p})
    st = Stacker.fit(df(mk(0.2)), df(mk(0.25)), df(mk(0.3)))
    p_img = st.fuse(0.9, 0.8)
    assert 0 <= p_img <= 1
    p3 = st.fuse(0.9, 0.8, 0.7)
    p_legacy = st.fuse(0.9, 0.8, 0.7, legacy_blend=True)
    assert p_legacy == pytest.approx(0.5 * st.fuse(0.9, 0.8) + 0.5 * 0.7)
    assert "max_f1" in st.thresholds


def test_predict_service_contracts():
    # resolution gate + all-or-none + graceful no-stream handling,
    # with stub stream predictors (no CNNs: service logic only)
    svc = PredictService(
        mm_predict=lambda img, tab: 0.8,
        mil_predict=lambda img: 0.7,
        tab_predict=lambda tab: 0.6,
        min_resolution=64,
    )
    small = synth_images(1, 32, seed=1)[0]
    out = svc.predict_one(small)
    assert "error" in out and "resolution" in out["error"]

    img = synth_images(1, 64, seed=2)[0]
    partial_fields = {k: None for k in FIELD_ORDER}
    partial_fields["depth"] = "≤ 4mm"
    out = svc.predict_one(img, partial_fields)
    assert "error" in out and "missing" in out["error"]

    out = svc.predict_one(img)
    assert out["label"] in ("Direct", "Indirect")
    assert not out["used_tabular"]
    assert set(out["streams"]) == {"prob_mm", "prob_mil"}

    full = {k: list(CHOICES_MAP[k])[0] for k in FIELD_ORDER}
    out = svc.predict_one(img, full)
    assert out["used_tabular"]
    assert set(out["streams"]) == {"prob_mm", "prob_mil", "prob_tab"}
    assert out["processed_image"].shape == (512, 512, 3)
