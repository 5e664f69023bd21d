"""Clinical feature spec: 9 base features + 7 engineered interactions.

Single source of truth for what the reference duplicates across five files
(models/xgboost_model.py:19-50, models/lightgbm_model.py:21-35,
models/stack_blend.py:70-84, tests/evaluate_models.py:24-41,
src/fusion/prepare_streams.py:9-44).

Two implementations with identical semantics:
- :func:`build_features` — pandas, for the artifact/table layer;
- :func:`engineer_features_jax` — jit-able, for on-device serving so the
  tabular stream needs no host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd

BASE_FEATURES: tuple[str, ...] = (
    "depth",
    "width",
    "enamel_cracks",
    "occlusal_load",
    "carious_lesion",
    "opposing_type",
    "adjacent_teeth",
    "age_range",
    "cervical_lesion",
)

ENGINEERED_FEATURES: tuple[str, ...] = (
    "deep_and_thin",
    "deep_or_cracks",
    "load_implant",
    "risk_plus_cervical",
    "stable_wall",
    "depth_x_load",
    "depth_x_risk",
)

ALL_FEATURES: tuple[str, ...] = BASE_FEATURES + ENGINEERED_FEATURES

# Monotonicity prior over BASE_FEATURES (models/xgboost_model.py:30):
# depth(+), width(-), cracks(+), load(+), lesion(+), opposing(0),
# adjacent(0), age(0), cervical(+)
DEFAULT_MONOTONE: tuple[int, ...] = (1, -1, 1, 1, 1, 0, 0, 0, 1)

LABEL_HARD = "y_majority"
LABEL_SOFT = "p_indirect"
SAMPLE_WEIGHT = "weight"


def build_features(df: pd.DataFrame, impute_zero: bool = True) -> pd.DataFrame:
    """9 base → 16 ordered columns (prepare_streams.py:19-44 semantics)."""
    missing = [c for c in BASE_FEATURES if c not in df.columns]
    if missing:
        raise KeyError(f"Missing base features: {missing}")
    X = df[list(BASE_FEATURES)].copy()
    for c in BASE_FEATURES:
        col = pd.to_numeric(X[c], errors="coerce")
        X[c] = (col.fillna(0) if impute_zero else col).astype(int)

    d, w = X["depth"], X["width"]
    ec, ol = X["enamel_cracks"], X["occlusal_load"]
    cl, ot, cv = X["carious_lesion"], X["opposing_type"], X["cervical_lesion"]
    X["deep_and_thin"] = ((d == 1) & (w == 0)).astype(int)
    X["deep_or_cracks"] = ((d == 1) | (ec == 1)).astype(int)
    X["load_implant"] = ((ol == 1) & (ot == 3)).astype(int)
    X["risk_plus_cervical"] = ((cl == 1) & (cv == 1)).astype(int)
    X["stable_wall"] = ((w == 1) & (ec == 0) & (ol == 0)).astype(int)
    X["depth_x_load"] = (d * ol).astype(int)
    X["depth_x_risk"] = (d * cl).astype(int)
    return X[list(ALL_FEATURES)]


def engineer_features_jax(x_base: jnp.ndarray) -> jnp.ndarray:
    """[..., 9] base features → [..., 16] engineered, jit-able.

    Column order matches :data:`ALL_FEATURES`. Inputs may be float; the
    boolean combos compare against exact encodings like the table path.
    """
    d = x_base[..., 0]
    w = x_base[..., 1]
    ec = x_base[..., 2]
    ol = x_base[..., 3]
    cl = x_base[..., 4]
    ot = x_base[..., 5]
    cv = x_base[..., 8]
    eng = jnp.stack(
        [
            ((d == 1) & (w == 0)).astype(x_base.dtype),
            ((d == 1) | (ec == 1)).astype(x_base.dtype),
            ((ol == 1) & (ot == 3)).astype(x_base.dtype),
            ((cl == 1) & (cv == 1)).astype(x_base.dtype),
            ((w == 1) & (ec == 0) & (ol == 0)).astype(x_base.dtype),
            d * ol,
            d * cl,
        ],
        axis=-1,
    )
    return jnp.concatenate([x_base, eng], axis=-1)


def features_to_array(df: pd.DataFrame, engineered: bool = True) -> np.ndarray:
    X = build_features(df) if engineered else df[list(BASE_FEATURES)]
    return np.asarray(X, dtype=np.float32)
