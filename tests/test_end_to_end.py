"""Capstone: the full headline pipeline end-to-end on synthetic data.

Mirrors the reference's final-system flow (SURVEY.md §3.3-3.4):
raw cohort → standardize → augmented records (device-batched) →
MM dual-task k-fold stream + MIL k-fold stream (OOF/test CSVs) →
final stack (tab GBDT OOF + LR meta over [tab, mm, mil]) →
stack_oof.csv / stack_test.csv / summary.json with the published schema.

Miniaturized (TinyNet, 2 folds, 2× augmentation, 32px) — asserts the
plumbing and artifact contracts plus above-chance end-to-end AUC.
"""

import json

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.config import FusionConfig, GBDTConfig, MILConfig, MMJointConfig
from mmtrs_tpu.data.records import build_augmented_table
from tests.synth import synth_images, synth_standardized


@pytest.mark.slow
def test_full_system_end_to_end(tmp_path):
    # 1. cohort + images (tabular features and image cue both carry signal)
    n = 50
    df = synth_standardized(n, seed=71).drop(columns=["split"])
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 32, seed=72, labels=y)

    # 2. offline augmentation with lineage (children inherit split)
    table, aug_imgs = build_augmented_table(
        df, imgs, n_aug=2, preset="ten", seed=42, test_frac=0.25
    )
    assert len(table) == n * 3

    # 3. stream 2: MM dual-task k-fold
    from mmtrs_tpu.train.mm import run_mm_kfold

    mm_cfg = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=16,
                           lr=1e-3, n_folds=2, epochs=3, train_aug="none")
    mm = run_mm_kfold(aug_imgs, table, mm_cfg, outdir=tmp_path / "mm",
                      epochs=3, log=lambda *a: None)

    # 4. stream 3: MIL k-fold
    from mmtrs_tpu.train.mil import run_mil_kfold

    mil_cfg = MILConfig(model_name="test_cnn", bag_size=2, img_size=32,
                        attn_dim=8, epochs=3, batch_size=16, lr=1e-3, n_folds=2)
    mil = run_mil_kfold(aug_imgs, table, mil_cfg, outdir=tmp_path / "mil",
                        epochs=3, log=lambda *a: None)

    # 5. final stack: fresh tabular OOF + LR meta over the three streams
    from mmtrs_tpu.fusion import run_final_stack

    cfg = FusionConfig(n_folds=2, thr_mode="max_f1")
    tab_cfg = GBDTConfig(**{**GBDTConfig.stack_tab_like().__dict__,
                            "n_estimators": 120})
    summary = run_final_stack(
        table,
        oof_mm=mm["oof"], pred_mm=mm["test"],
        oof_mil=mil["oof"], pred_mil=mil["test"],
        outdir=tmp_path / "stack", cfg=cfg, tab_cfg=tab_cfg,
    )

    # artifact schema = the reference's published contract
    assert summary["features"] == ["prob_tab", "prob_mm", "prob_mil"]
    assert set(summary["oof"]) == {"auc", "acc", "prec", "rec", "f1"}
    for f in ("stack_oof.csv", "stack_test.csv", "summary.json"):
        assert (tmp_path / "stack" / f).exists()
    disk = json.loads((tmp_path / "stack" / "summary.json").read_text())
    assert disk["test"] == summary["test"]
    oof_csv = pd.read_csv(tmp_path / "stack" / "stack_oof.csv")
    assert list(oof_csv.columns) == ["image_name", "y", "prob"]

    # end-to-end quality: the OOF bar (37 cases) is the only learning check
    # with any power here — the ~13-case test split has AUC granularity
    # ≈ 1/42 and stream-level variance of ±0.3 (probed: mm 0.41 / mil 1.00
    # on the same run), so test-side bars would be vacuous and are omitted.
    # Chip-scale quality lives in scripts/rehearsal.py, not here.
    assert summary["oof"]["auc"] > 0.6
    assert 0.0 <= summary["test"]["auc"] <= 1.0
