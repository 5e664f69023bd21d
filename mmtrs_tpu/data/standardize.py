"""Tabular standardization: raw clinician strings → numeric encodings + targets.

Functional parity with src/preprocessing/Standraized_dataset.py:
- mappers (:65-159): depth (≤4mm→0, >4mm→1), width (<1mm→0, ≥1mm→1),
  yes/no fields, carious_lesion (low→-1/moderate→0/high→1), opposing_type
  (natural→0/missing→1/FPD→2/implant→3), adjacent_teeth (one side→0/both→1),
  age_range (<20→0, ≥20→1);
- compute_targets (:163-184): p_indirect = Indirect/(Direct+Indirect),
  y_majority = p_indirect≥0.5, weight = |2p−1|;
- add_split (:210-218): exactly `test_count` random test rows, default_rng(seed).

Rebuilt as a declarative rule engine: each field has an ordered list of
(predicate, value) rules evaluated on a normalized string. Same outputs, one
table instead of seven near-identical functions.
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pandas as pd

Rule = tuple[Callable[[str], bool], int]


def _norm(s) -> str:
    if pd.isna(s):
        return ""
    s = str(s).strip().lower()
    s = re.sub(r"\s+", " ", s)
    s = (
        s.replace("≤", "<=")
        .replace("≥", ">=")
        .replace("–", "-")
        .replace("—", "-")
        .replace("mm", " mm")
    )
    return re.sub(r"\s+", " ", s)


def _search(pattern: str) -> Callable[[str], bool]:
    rx = re.compile(pattern)
    return lambda s: rx.search(s) is not None


def _contains(*subs: str) -> Callable[[str], bool]:
    return lambda s: any(sub in s for sub in subs)


def _in_set(*vals: str) -> Callable[[str], bool]:
    vs = set(vals)
    return lambda s: s in vs


def _depth_numeric(s: str):
    m = re.search(r"(\d+(?:\.\d+)?)\s*mm", s)
    if m:
        try:
            return 1 if float(m.group(1)) > 4.0 else 0
        except ValueError:
            return None
    return None


def map_depth(val):
    s = _norm(val)
    if not s:
        return pd.NA
    if re.search(r"(>|\bgreater)\s*=?\s*4\s*mm", s):
        return 1
    if re.search(r"(<=|<|≤|\ble?\b)\s*=?\s*4\s*mm", s):
        return 0
    v = _depth_numeric(s)
    return v if v is not None else pd.NA


def map_width(val):
    s = _norm(val)
    if not s:
        return pd.NA
    if "all" in s and ("1 mm" in s or ">= 1 mm" in s or ">=1 mm" in s):
        return 1
    if "some" in s and ("< 1 mm" in s or "<1 mm" in s or "<1mm" in s):
        return 0
    if re.search(r"(>=|>)\s*1\s*mm", s):
        return 1
    if re.search(r"(<|<=)\s*1\s*mm", s):
        return 0
    return pd.NA


_YES = _in_set("yes", "y", "present", "presence", "true", "1")
_NO = _in_set("no", "n", "absent", "absence", "false", "0")


def map_yes_no(val):
    s = _norm(val)
    if not s:
        return pd.NA
    if _YES(s):
        return 1
    if _NO(s):
        return 0
    return pd.NA


_ORDERED_RULES: dict[str, list[Rule]] = {
    "carious_lesion": [
        (_contains("low"), -1),
        (_contains("moderate", "medium"), 0),
        (_contains("high"), 1),
    ],
    "opposing_type": [
        (_contains("natural"), 0),
        (_contains("missing", "none"), 1),
        (_contains("fpd", "fixed partial denture"), 2),
        (_contains("implant"), 3),
    ],
    "adjacent_teeth": [
        (_contains("presence from one side", "one side"), 0),
        (_contains("presence", "present"), 1),
    ],
}


def _map_rules(field: str, val):
    s = _norm(val)
    if not s:
        return pd.NA
    for pred, enc in _ORDERED_RULES[field]:
        if pred(s):
            return enc
    return pd.NA


def map_carious_lesion(val):
    return _map_rules("carious_lesion", val)


def map_opposing_type(val):
    return _map_rules("opposing_type", val)


def map_adjacent_teeth(val):
    return _map_rules("adjacent_teeth", val)


def map_age_range(val):
    s = _norm(val).replace("&", "")
    if not s:
        return pd.NA
    if "< 20" in s or "<20" in s:
        return 0
    if "20-60" in s or ">= 20" in s or "20 - 60" in s:
        return 1
    m = re.search(r"(\d+)\s*-\s*(\d+)", s)
    if m:
        lo, hi = int(m.group(1)), int(m.group(2))
        return 1 if lo >= 20 and hi >= 60 else 0
    return pd.NA


FIELD_MAPPERS: dict[str, Callable] = {
    "depth": map_depth,
    "width": map_width,
    "enamel_cracks": map_yes_no,
    "occlusal_load": map_yes_no,
    "carious_lesion": map_carious_lesion,
    "opposing_type": map_opposing_type,
    "adjacent_teeth": map_adjacent_teeth,
    "age_range": map_age_range,
    "cervical_lesion": map_yes_no,
}


def compute_targets(df: pd.DataFrame) -> pd.DataFrame:
    """p_indirect / y_majority / weight from expert vote counts
    (Standraized_dataset.py:163-184)."""
    df = df.copy()
    direct = pd.to_numeric(df.get("Direct"), errors="coerce").fillna(0)
    indirect = pd.to_numeric(df.get("Indirect"), errors="coerce").fillna(0)
    total = direct + indirect
    p = (indirect / total).replace([np.inf, -np.inf], np.nan).fillna(0.0).clip(0.0, 1.0)
    df["Direct"], df["Indirect"] = direct, indirect
    df["p_indirect"] = p.astype(float)
    df["y_majority"] = (df["p_indirect"] >= 0.5).astype("Int64")
    df["weight"] = (df["p_indirect"] * 2 - 1).abs().fillna(0.0)
    return df


def standardize_table(df: pd.DataFrame, strict: bool = True) -> pd.DataFrame:
    """Map all categorical fields in place and compute targets
    (Standraized_dataset.py:187-207)."""
    df = df.copy()
    for col, fn in FIELD_MAPPERS.items():
        if col not in df.columns:
            if strict:
                raise KeyError(f"Missing required column: '{col}'")
            continue
        df[col] = df[col].apply(fn).astype("Int64")
    return compute_targets(df)


def add_split(df: pd.DataFrame, test_count: int = 80, seed: int = 42) -> pd.DataFrame:
    """Exactly-N random test rows (Standraized_dataset.py:210-218)."""
    df = df.copy()
    n = len(df)
    k = min(test_count, n)
    rng = np.random.default_rng(seed)
    test_idx = rng.choice(n, size=k, replace=False)
    split = np.array(["train"] * n, dtype=object)
    split[test_idx] = "test"
    df["split"] = split
    return df
