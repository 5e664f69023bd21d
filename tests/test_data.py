"""Data layer: standardizer mappers, feature engineering, split machinery."""

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.data import (
    ALL_FEATURES,
    BASE_FEATURES,
    build_features,
    engineer_features_jax,
    standardize_table,
    add_split,
    balanced_grouped_split,
    grouped_train_test_split,
    group_kfold,
    stratified_group_kfold,
    propagate_split_to_augmented,
    audit_report,
)
from mmtrs_tpu.data.splits import (
    ThreeWaySplitConfig,
    assert_no_group_leakage,
    make_group_fold_table,
)
from mmtrs_tpu.data.standardize import (
    map_depth,
    map_width,
    map_yes_no,
    map_carious_lesion,
    map_opposing_type,
    map_adjacent_teeth,
    map_age_range,
)
from tests.synth import synth_cohort, synth_standardized


# --------------------------- mappers (Standraized_dataset.py:65-159) --------


def test_map_depth():
    # NB reference quirk (Standraized_dataset.py:69): "greater than 4mm"
    # does NOT match the >4mm regex (no "than" allowed); it falls through to
    # the numeric rule where 4.0 > 4.0 is false → 0. Preserved.
    assert map_depth("Greater than 4mm") == 0
    assert map_depth("greater 4 mm") == 1
    assert map_depth(">4 mm") == 1
    assert map_depth("≤ 4mm") == 0
    assert map_depth("<=4 mm") == 0
    assert map_depth("5.5 mm") == 1
    assert map_depth("3 mm") == 0
    assert map_depth("") is pd.NA
    assert map_depth(None) is pd.NA


def test_map_width():
    assert map_width("All remaining walls >= 1mm") == 1
    # NB reference quirk (Standraized_dataset.py:86): `"all" in s` matches the
    # substring inside "w-all-s", so "some walls < 1mm" ALSO hits the all+1mm
    # rule and returns 1. Preserved bit-for-bit.
    assert map_width("some walls < 1mm") == 1
    assert map_width("some w. < 1mm") == 0
    assert map_width("> 1 mm") == 1
    assert map_width("<1mm") == 0
    assert map_width("unknown") is pd.NA


def test_map_yes_no():
    for v in ("Yes", "y", "Present", "TRUE", "1", "presence"):
        assert map_yes_no(v) == 1
    for v in ("No", "n", "Absent", "false", "0", "absence"):
        assert map_yes_no(v) == 0
    assert map_yes_no("maybe") is pd.NA


def test_map_ordinal_fields():
    assert map_carious_lesion("Low") == -1
    assert map_carious_lesion("moderate risk") == 0
    assert map_carious_lesion("HIGH") == 1
    assert map_opposing_type("Natural tooth") == 0
    assert map_opposing_type("missing") == 1
    assert map_opposing_type("FPD") == 2
    assert map_opposing_type("fixed partial denture") == 2
    assert map_opposing_type("implant") == 3
    assert map_adjacent_teeth("Presence from one side") == 0
    assert map_adjacent_teeth("presence") == 1
    assert map_age_range("<20") == 0
    assert map_age_range("20-60") == 1
    assert map_age_range("25 - 45") == 0  # hi < 60 → 0 per reference rule
    assert map_age_range("20 - 70") == 1


def test_standardize_and_targets():
    df = standardize_table(synth_cohort(50, seed=1))
    for c in BASE_FEATURES:
        assert df[c].notna().all(), c
    # targets
    assert ((df["p_indirect"] >= 0) & (df["p_indirect"] <= 1)).all()
    expect_y = (df["p_indirect"] >= 0.5).astype(int)
    assert (df["y_majority"].astype(int) == expect_y).all()
    assert np.allclose(df["weight"], (2 * df["p_indirect"] - 1).abs())


def test_add_split_exact_count_and_seed():
    df = add_split(synth_standardized(200, seed=2), test_count=40, seed=42)
    assert (df["split"] == "test").sum() == 40
    df2 = add_split(df.drop(columns=["split"]), test_count=40, seed=42)
    assert (df["split"] == df2["split"]).all()


# --------------------------- features ---------------------------------------


def test_build_features_order_and_values():
    df = synth_standardized(100, seed=3)
    X = build_features(df)
    assert list(X.columns) == list(ALL_FEATURES)
    assert (X["deep_and_thin"] == ((df["depth"] == 1) & (df["width"] == 0)).astype(int)).all()
    assert (X["depth_x_risk"] == df["depth"].astype(int) * df["carious_lesion"].astype(int)).all()


def test_engineer_features_jax_matches_pandas():
    df = synth_standardized(64, seed=4)
    X_pd = build_features(df).to_numpy().astype(np.float32)
    x_base = df[list(BASE_FEATURES)].to_numpy().astype(np.float32)
    X_jax = np.asarray(engineer_features_jax(x_base))
    np.testing.assert_allclose(X_jax, X_pd, rtol=0, atol=0)


# --------------------------- splits -----------------------------------------


def _df_with_groups(n=300, seed=5):
    df = synth_standardized(n, seed=seed)
    df["origin_id"] = np.arange(n) // 3  # 3 rows per group
    return df


def test_grouped_train_test_split_no_leakage():
    df = _df_with_groups()
    tr, te = grouped_train_test_split(df, 0.2, 42)
    g_tr = set(df.iloc[tr]["origin_id"])
    g_te = set(df.iloc[te]["origin_id"])
    assert not (g_tr & g_te)


def test_balanced_grouped_split_matches_reference_search():
    """Cross-check against a literal reimplementation of split_utils.py:54-91."""
    from sklearn.model_selection import GroupShuffleSplit

    df = _df_with_groups(150, seed=6)
    cfg = ThreeWaySplitConfig(max_trials=25)
    tr, va, te = balanced_grouped_split(df, cfg)

    # reference loop (dataframe-based)
    best, best_score = None, np.inf
    y_all = df["y_majority"].astype(int).values
    p_all = y_all.mean()
    for t in range(cfg.max_trials):
        rnd = cfg.seed + t
        gss_test = GroupShuffleSplit(1, test_size=cfg.test_frac, random_state=rnd)
        idx_trval, idx_test = next(gss_test.split(df, groups=df["origin_id"].astype(str).values))
        df_trval = df.iloc[idx_trval].reset_index(drop=True)
        rel = cfg.val_frac / (1 - cfg.test_frac)
        gss_val = GroupShuffleSplit(1, test_size=rel, random_state=rnd + 11)
        i_tr, i_va = next(gss_val.split(df_trval, groups=df_trval["origin_id"].astype(str).values))
        sizes = np.array([len(i_tr), len(i_va), len(idx_test)], float)
        tgt = np.array([cfg.train_frac, cfg.val_frac, cfg.test_frac]) * len(df)
        size_err = np.abs(sizes - tgt) / (len(df) + 1e-6)
        rates = np.array(
            [
                y_all[idx_trval[i_tr]].mean(),
                y_all[idx_trval[i_va]].mean(),
                y_all[idx_test].mean(),
            ]
        )
        w = np.array([0.6, 1.0, 1.0])
        sc = (size_err * w).sum() + 0.75 * (np.abs(rates - p_all) * w).sum()
        if sc < best_score:
            best_score, best = sc, (idx_trval[i_tr], idx_trval[i_va], idx_test)
    np.testing.assert_array_equal(np.sort(tr), np.sort(best[0]))
    np.testing.assert_array_equal(np.sort(va), np.sort(best[1]))
    np.testing.assert_array_equal(np.sort(te), np.sort(best[2]))


def test_group_kfold_and_sgkf_cover_all():
    df = _df_with_groups(120, seed=7)
    seen = np.zeros(len(df), bool)
    for tr, va in group_kfold(df, 5):
        assert not (set(df.iloc[tr]["origin_id"]) & set(df.iloc[va]["origin_id"]))
        seen[va] = True
    assert seen.all()
    seen[:] = False
    for tr, va in stratified_group_kfold(df["y_majority"], df["origin_id"], 5):
        seen[va] = True
    assert seen.all()


def test_propagate_split_and_leakage_assert():
    base = _df_with_groups(60, seed=8)
    base = add_split(base, test_count=12, seed=42)
    # make split group-consistent first (group → first row's split)
    gmap = base.groupby("origin_id")["split"].first()
    base["split"] = base["origin_id"].map(gmap)
    aug = base.loc[base.index.repeat(3)].reset_index(drop=True).drop(columns=["split"])
    aug["image_name"] = [f"{i}_aug{k}.jpg" for i, k in zip(aug.index, range(len(aug)))]
    out = propagate_split_to_augmented(aug, base)
    assert out["split"].notna().all()
    merged = out.merge(gmap.rename("want"), left_on="origin_id", right_index=True)
    assert (merged["split"] == merged["want"]).all()
    assert_no_group_leakage(out)
    out.loc[0, "split"] = "test" if out.loc[0, "split"] != "test" else "train"
    with pytest.raises(AssertionError):
        assert_no_group_leakage(out)


def test_make_group_fold_table():
    df = _df_with_groups(200, seed=9)
    out = make_group_fold_table(df, n_folds=5, test_prop=0.2, seed=42)
    assert set(out["split"]) <= {"train", "val", "test"}
    pool = out[out["split"] != "test"]
    assert pool["fold"].notna().all()
    assert set(pool["fold"].astype(int)) == set(range(5))
    assert_no_group_leakage(out[out["split"] != "val"])
    rep = audit_report(out)
    assert rep["test"]["rows"] > 0 and rep["train"]["rows"] > 0
