"""Group-aware split machinery.

Tiny-data reproducibility is parity-critical (SURVEY.md §7 hard part 5): with
422 cases, split drift moves test AUC by points. sklearn's splitters are used
for the *index generation* (identical seeding to the reference) while all
model compute stays in JAX. Parity targets:

- grouped train/test + grouped val:   augment_records.py:427-432,544-560
- 400-trial balanced 3-way search:    experiments/data_v2/split_utils.py:54-91
- split propagation to augmented:     split_utils.py:140-198
- audit report:                        split_utils.py:201-220
- k-fold exporters:                    scripts/make_group_splits.py:29-70
- fold drivers: GroupKFold(5) on origin_id (train_mm_joint_dualtask.py:194-198,
  train_mil_attention_v1.py:152-156), StratifiedKFold(5) (models/stack_blend.py:149),
  StratifiedGroupKFold (train_hard_kfold_v2.py:249-252)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from sklearn.model_selection import (
    GroupKFold,
    GroupShuffleSplit,
    StratifiedGroupKFold,
    StratifiedKFold,
    StratifiedShuffleSplit,
)


def grouped_train_test_split(
    df: pd.DataFrame,
    test_frac: float = 0.2,
    seed: int = 42,
    group_col: str = "origin_id",
) -> tuple[np.ndarray, np.ndarray]:
    """Row indices of a group-exclusive train/test split
    (augment_records.py:427-432)."""
    gss = GroupShuffleSplit(n_splits=1, test_size=test_frac, random_state=seed)
    groups = df[group_col].astype(str).values
    return next(gss.split(df, groups=groups))


def group_kfold(df: pd.DataFrame, n_folds: int = 5, group_col: str = "origin_id"):
    """Deterministic GroupKFold over a column (no shuffling, sklearn order)."""
    gkf = GroupKFold(n_splits=n_folds)
    groups = df[group_col].values
    yield from gkf.split(df, groups=groups)


def stratified_kfold(y, n_folds: int = 5, seed: int = 42, shuffle: bool = True):
    skf = StratifiedKFold(n_splits=n_folds, shuffle=shuffle, random_state=seed if shuffle else None)
    y = np.asarray(y).astype(int)
    yield from skf.split(np.zeros(len(y)), y)


def stratified_group_kfold(y, groups, n_folds: int = 5, seed: int = 42):
    sgkf = StratifiedGroupKFold(n_splits=n_folds, shuffle=True, random_state=seed)
    y = np.asarray(y).astype(int)
    yield from sgkf.split(np.zeros(len(y)), y, np.asarray(groups))


# ---------------------------------------------------------------------------
# Balanced grouped 3-way split (400-trial random search)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ThreeWaySplitConfig:
    train_frac: float = 0.70
    val_frac: float = 0.15
    test_frac: float = 0.15
    seed: int = 42
    group_col: str = "origin_id"
    label_col: str = "y_majority"
    max_trials: int = 400


def _pos_rate(y: np.ndarray) -> float:
    return float(y.mean()) if y.size else 0.0


def _score_balance(sizes, pos_rates, pos_rate_all, cfg: ThreeWaySplitConfig) -> float:
    """split_utils.py:33-51: weighted size error + 0.75×weighted pos-rate
    deviation, weights (0.6, 1.0, 1.0) emphasizing val/test."""
    n = float(sum(sizes))
    tgt = np.array([cfg.train_frac, cfg.val_frac, cfg.test_frac]) * n
    size_err = np.abs(np.asarray(sizes, dtype=float) - tgt) / (n + 1e-6)
    pr_err = np.abs(np.asarray(pos_rates) - pos_rate_all)
    w = np.array([0.6, 1.0, 1.0])
    return float((size_err * w).sum() + 0.75 * (pr_err * w).sum())


def balanced_grouped_split(
    df: pd.DataFrame, cfg: ThreeWaySplitConfig = ThreeWaySplitConfig()
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """400-trial search over nested GroupShuffleSplits; returns row-index
    arrays (train, val, test). Reference: split_utils.py:54-91 — trial t uses
    random_state seed+t for the test split and seed+t+11 for the val split."""
    s = cfg.train_frac + cfg.val_frac + cfg.test_frac
    if abs(s - 1.0) > 1e-6:
        raise ValueError(f"Fractions must sum to 1.0 (got {s})")
    if cfg.group_col not in df.columns:
        return stratified_row_split(df, cfg)

    y = df[cfg.label_col].astype(int).values
    groups = df[cfg.group_col].astype(str).values
    p_all = _pos_rate(y)

    best, best_score = None, np.inf
    rel_val = cfg.val_frac / (1.0 - cfg.test_frac) if cfg.test_frac < 1.0 else 0.0
    for t in range(cfg.max_trials):
        rnd = cfg.seed + t
        gss_test = GroupShuffleSplit(n_splits=1, test_size=cfg.test_frac, random_state=rnd)
        idx_trval, idx_test = next(gss_test.split(df, groups=groups))
        gss_val = GroupShuffleSplit(n_splits=1, test_size=rel_val, random_state=rnd + 11)
        sub_train, sub_val = next(
            gss_val.split(idx_trval.reshape(-1, 1), groups=groups[idx_trval])
        )
        idx_train, idx_val = idx_trval[sub_train], idx_trval[sub_val]
        sc = _score_balance(
            (idx_train.size, idx_val.size, idx_test.size),
            (_pos_rate(y[idx_train]), _pos_rate(y[idx_val]), _pos_rate(y[idx_test])),
            p_all,
            cfg,
        )
        if sc < best_score:
            best_score, best = sc, (idx_train, idx_val, idx_test)
    return best


def stratified_row_split(
    df: pd.DataFrame, cfg: ThreeWaySplitConfig = ThreeWaySplitConfig()
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row-level stratified fallback (split_utils.py:113-137)."""
    y = df[cfg.label_col].astype(int).values
    sss_test = StratifiedShuffleSplit(n_splits=1, test_size=cfg.test_frac, random_state=cfg.seed)
    idx_trval, idx_test = next(sss_test.split(np.zeros(len(df)), y))
    rel_val = cfg.val_frac / (1.0 - cfg.test_frac)
    sss_val = StratifiedShuffleSplit(n_splits=1, test_size=rel_val, random_state=cfg.seed + 1)
    sub_train, sub_val = next(sss_val.split(np.zeros(idx_trval.size), y[idx_trval]))
    return idx_trval[sub_train], idx_trval[sub_val], idx_test


# ---------------------------------------------------------------------------
# Split propagation + audits
# ---------------------------------------------------------------------------


def _parent_stem(name: str) -> str:
    stem = str(name)
    for key in ("__aug", "_aug", "__AUG", "_AUG"):
        if key in stem:
            stem = stem.split(key)[0]
    return stem


def propagate_split_to_augmented(
    df_aug: pd.DataFrame,
    df_base: pd.DataFrame,
    group_col: str = "origin_id",
    image_col_aug: str = "image_name",
    image_col_base: str = "image_name",
    parent_col_aug: str | None = None,
) -> pd.DataFrame:
    """Augmented rows inherit their parent's split (split_utils.py:140-198):
    join on group → explicit parent column → stem heuristic → 'train'."""
    out = df_aug.drop(columns=["split"], errors="ignore").copy()

    if group_col in out.columns and group_col in df_base.columns:
        m = df_base[[group_col, "split"]].drop_duplicates()
        out = out.merge(m, on=group_col, how="left")
        if out["split"].notna().all():
            return out
        out = out.drop(columns=["split"])

    if parent_col_aug and parent_col_aug in out.columns:
        m = df_base[[image_col_base, "split"]].rename(columns={image_col_base: parent_col_aug})
        out = out.merge(m.drop_duplicates(), on=parent_col_aug, how="left")
        if out["split"].notna().all():
            return out
        out = out.drop(columns=["split"])

    base = df_base.copy()
    base["__stem"] = base[image_col_base].astype(str).map(_parent_stem)
    out["__stem"] = out[image_col_aug].astype(str).map(_parent_stem)
    out = out.merge(base[["__stem", "split"]].drop_duplicates(), on="__stem", how="left")
    out["split"] = out["split"].fillna("train")
    return out.drop(columns="__stem")


def assert_no_group_leakage(df: pd.DataFrame, group_col: str = "origin_id") -> None:
    """Hard-fail if any group spans splits (make_balanced_splits.py:193-209)."""
    spans = df.groupby(group_col)["split"].nunique()
    bad = spans[spans > 1]
    if len(bad):
        raise AssertionError(
            f"group leakage: {len(bad)} groups span multiple splits, e.g. "
            f"{bad.index[:5].tolist()}"
        )


def audit_report(df: pd.DataFrame, label_col: str = "y_majority") -> dict:
    """Per-split counts and positive rates (split_utils.py:201-220)."""
    out = {}
    for s in ("train", "val", "test"):
        d = df[df["split"].astype(str).str.lower() == s]
        if len(d) == 0:
            out[s] = {"rows": 0}
            continue
        yv = d[label_col].astype(int).values
        pos = int(yv.sum())
        out[s] = {
            "rows": len(d),
            "neg": len(d) - pos,
            "pos": pos,
            "pos_rate": round(pos / len(d), 4),
        }
    return out


def make_group_fold_table(
    df: pd.DataFrame,
    n_folds: int = 5,
    test_prop: float = 0.2,
    seed: int = 42,
    label_col: str = "y_majority",
    group_col: str = "origin_id",
) -> pd.DataFrame:
    """Group test holdout + StratifiedGroupKFold fold ids
    (scripts/make_group_splits.py:29-60). Adds `split` and `fold` columns;
    fold 0 marked 'val' for convenience, test rows fold=NaN."""
    df = df.copy()
    groups = df[group_col].values
    y = df[label_col].astype(int).values
    if test_prop > 0:
        gss = GroupShuffleSplit(n_splits=1, test_size=test_prop, random_state=seed)
        _, test_idx = next(gss.split(np.zeros_like(groups), y, groups))
        test_groups = set(groups[test_idx])
        df["split"] = np.where(df[group_col].isin(test_groups), "test", "pool")
    else:
        df["split"] = "pool"
    pool = df[df["split"] == "pool"]
    folds = np.full(len(pool), -1, dtype=int)
    sgkf = StratifiedGroupKFold(n_splits=n_folds, shuffle=True, random_state=seed)
    for fold_id, (_, val_idx) in enumerate(
        sgkf.split(pool, pool[label_col].astype(int).values, pool[group_col].values)
    ):
        folds[val_idx] = fold_id
    assert (folds >= 0).all()
    df.loc[pool.index, "fold"] = folds
    df.loc[df["split"] == "pool", "split"] = "train"
    df.loc[(df["split"] == "train") & (df["fold"] == 0), "split"] = "val"
    return df
