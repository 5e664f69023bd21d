"""Synthetic data generators for hermetic tests.

The reference ships no dataset, so tests fabricate a cohort with the same
schema: raw clinician strings for the 9 features, Direct/Indirect expert vote
counts, and tooth-ish images (bright ellipse on dark background) whose
appearance correlates with the label so models can learn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEPTH_STRINGS = {0: "<= 4mm", 1: "> 4mm"}
WIDTH_STRINGS = {0: "< 1mm", 1: ">= 1mm"}
YESNO_STRINGS = {0: "No", 1: "Yes"}
CARIOUS_STRINGS = {-1: "Low risk", 0: "Moderate risk", 1: "High risk"}
OPPOSING_STRINGS = {0: "Natural tooth", 1: "Missing", 2: "FPD", 3: "Implant"}
ADJACENT_STRINGS = {0: "Presence from one side", 1: "Presence"}
AGE_STRINGS = {0: "<20", 1: "20-60"}


def synth_cohort(n: int = 422, seed: int = 0) -> pd.DataFrame:
    """Raw (pre-standardization) cohort table with a learnable signal."""
    rng = np.random.default_rng(seed)
    depth = rng.integers(0, 2, n)
    width = rng.integers(0, 2, n)
    cracks = rng.integers(0, 2, n)
    load = rng.integers(0, 2, n)
    carious = rng.integers(-1, 2, n)
    opposing = rng.integers(0, 4, n)
    adjacent = rng.integers(0, 2, n)
    age = rng.integers(0, 2, n)
    cervical = rng.integers(0, 2, n)

    # latent risk drives expert votes (monotone in depth/cracks/load/carious,
    # anti-monotone in width — mirroring DEFAULT_MONOTONE)
    logit = (
        1.2 * depth - 1.0 * width + 0.8 * cracks + 0.7 * load + 0.5 * carious
        + 0.4 * cervical + 0.2 * (opposing == 3) + rng.normal(0, 0.7, n) - 0.4
    )
    p = 1.0 / (1.0 + np.exp(-logit))
    n_experts = 7
    votes_ind = rng.binomial(n_experts, p)

    return pd.DataFrame(
        {
            "image_name": [f"{i + 1}.jpg" for i in range(n)],
            "depth": [DEPTH_STRINGS[v] for v in depth],
            "width": [WIDTH_STRINGS[v] for v in width],
            "enamel_cracks": [YESNO_STRINGS[v] for v in cracks],
            "occlusal_load": [YESNO_STRINGS[v] for v in load],
            "carious_lesion": [CARIOUS_STRINGS[v] for v in carious],
            "opposing_type": [OPPOSING_STRINGS[v] for v in opposing],
            "adjacent_teeth": [ADJACENT_STRINGS[v] for v in adjacent],
            "age_range": [AGE_STRINGS[v] for v in age],
            "cervical_lesion": [YESNO_STRINGS[v] for v in cervical],
            "Direct": n_experts - votes_ind,
            "Indirect": votes_ind,
        }
    )


def synth_standardized(n: int = 422, seed: int = 0) -> pd.DataFrame:
    """Post-standardization cohort (numeric features + targets + split)."""
    from mmtrs_tpu.data.standardize import add_split, standardize_table

    df = standardize_table(synth_cohort(n, seed))
    df = add_split(df, test_count=min(80, max(1, n // 5)), seed=42)
    df["origin_id"] = np.arange(1, n + 1)
    return df


def synth_images(
    n: int, size: int = 64, channels: int = 3, seed: int = 0, labels=None
) -> np.ndarray:
    """Tooth-ish uint8 images: bright rotated ellipse on dark gum-colored
    background. If labels given, label-1 images get a darker occlusal spot
    (a learnable visual cue)."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = np.empty((n, size, size, channels), dtype=np.uint8)
    for i in range(n):
        cx, cy = size / 2 + rng.normal(0, size * 0.05, 2)
        a = size * rng.uniform(0.22, 0.32)
        b = size * rng.uniform(0.15, 0.25)
        th = rng.uniform(-0.6, 0.6)
        dx, dy = xs - cx, ys - cy
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        mask = (u / a) ** 2 + (v / b) ** 2 <= 1.0
        img = np.empty((size, size, channels), dtype=np.float32)
        img[..., 0] = 60 + rng.normal(0, 6, (size, size))
        img[..., 1] = 35 + rng.normal(0, 6, (size, size))
        img[..., 2] = 40 + rng.normal(0, 6, (size, size))
        # yellowish tooth shade — saturation ≈ 75 so the segmenter's
        # metal-rejection gate (mean sat ≥ 40, segment.py:37-39) passes
        tooth = np.array([228.0, 208.0, 160.0])[:channels]
        img[mask] = tooth + rng.normal(0, 8, (int(mask.sum()), channels))
        if labels is not None and labels[i] == 1:
            spot = ((xs - cx) ** 2 + (ys - cy) ** 2) <= (size * 0.08) ** 2
            img[spot & mask] *= 0.45
        imgs[i] = np.clip(img, 0, 255).astype(np.uint8)
    return imgs
