"""K-fold vision trainer (v2/v3 tricks) + threshold-sweep evaluator."""

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest

from mmtrs_tpu.eval.threshold_sweep import (
    fit_temperature,
    pick_threshold,
    run_threshold_sweep,
)
from mmtrs_tpu.train.kfold import (
    KFoldConfig,
    KFoldHardTrainer,
    apply_mixup_cutmix,
    run_hard_kfold,
    tune_threshold_constrained,
)
from tests.synth import synth_images


def test_mixup_cutmix_soft_targets():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 16, 16, 3)).astype(np.float32) * 255)
    y = jnp.asarray(np.tile([0.0, 1.0], 4).astype(np.float32))
    out, t = apply_mixup_cutmix(imgs, y, jax.random.key(1), p=1.0)
    assert out.shape == imgs.shape
    t = np.asarray(t)
    assert ((t >= 0) & (t <= 1)).all()
    # gate off → identity
    out2, t2 = apply_mixup_cutmix(imgs, y, jax.random.key(1), p=0.0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(y))


def test_tune_threshold_constrained():
    rng = np.random.default_rng(1)
    y = (rng.random(300) < 0.5).astype(int)
    p = np.clip(0.5 + 0.3 * (2 * y - 1) + rng.normal(0, 0.2, 300), 0, 1)
    thr_uncon = tune_threshold_constrained(y, p, "max_f1", 0.0)
    thr_con = tune_threshold_constrained(y, p, "max_f1", 0.95)
    from mmtrs_tpu.metrics import binary_report

    assert binary_report(y, p, thr_con)["rec"] >= 0.95
    assert thr_con <= thr_uncon + 1e-9  # higher recall needs lower threshold


def test_kfold_trainer_learns_and_exports(tmp_path):
    n = 80
    rng = np.random.default_rng(2)
    y = (rng.random(n) < 0.5).astype(int)
    imgs = synth_images(n, 32, seed=3, labels=y)
    df = pd.DataFrame(
        {
            "image_name": [f"{i}.jpg" for i in range(n)],
            "y_majority": y,
            "origin_id": np.arange(n),
            "split": ["test" if i >= 64 else "train" for i in range(n)],
        }
    )
    cfg = KFoldConfig(
        model_name="test_cnn", img_size=32, epochs=3, batch_size=16,
        n_folds=2, use_mixup=True, ema_decay=0.9, patience=0, seed=0,
    )
    out = run_hard_kfold(imgs, df, cfg, outdir=tmp_path, log=lambda *a: None)
    # mechanics check: mixup+EMA on 3 TinyNet epochs over 32-row folds is
    # not a reliable learner — learning bars live in test_hard_trainer_learns;
    # here we assert the full driver runs, produces sane probabilities and
    # the stacking-CSV artifact schema
    assert 0.0 <= out["test_auc"] <= 1.0 and np.isfinite(out["test_auc"])
    assert len(out["folds"]) == 2
    assert all(np.isfinite(f["val_auc"]) for f in out["folds"])
    oof = pd.read_csv(tmp_path / "oof_val.csv")
    assert "prob_vis_hard" in oof.columns  # stacking CSV schema
    assert oof["prob_vis_hard"].between(0, 1).all()
    assert (tmp_path / "pred_test.csv").exists()


def test_kfold_freeze_and_overfit_debug():
    n = 40
    rng = np.random.default_rng(4)
    y = (rng.random(n) < 0.5).astype(int)
    imgs = synth_images(n, 32, seed=5, labels=y)
    cfg = KFoldConfig(
        model_name="test_cnn", img_size=32, epochs=2, batch_size=8,
        freeze_epochs=1, overfit_n=16, grad_accum=2, seed=0,
    )
    t = KFoldHardTrainer(cfg)
    best = t.fit_fold(imgs, y, np.arange(32), np.arange(32, 40), log=lambda *a: None)
    assert np.isfinite(best["auc"])
    probe = t.quick_train_probe(best["state"], imgs, y, n=16)
    assert 0 <= probe <= 1


def test_threshold_sweep_pipeline(tmp_path):
    rng = np.random.default_rng(6)
    folds_lv, folds_y, folds_lt = [], [], []
    # construct genuinely over-confident logits: labels drawn from the
    # calibrated logit z0, model reports 3·z0 → optimal temperature ≈ 3
    z0_test = rng.normal(0, 2.0, 100)
    y_test = (rng.random(100) < 1 / (1 + np.exp(-z0_test))).astype(int)
    for _ in range(3):
        z0 = rng.normal(0, 2.0, 80)
        yv = (rng.random(80) < 1 / (1 + np.exp(-z0))).astype(int)
        folds_lv.append(3.0 * z0)
        folds_y.append(yv)
        folds_lt.append(3.0 * z0_test)
    T = fit_temperature(folds_lv[0], folds_y[0])
    assert 1.5 < T < 6.0, T
    thr, at = pick_threshold(folds_y[0], 1 / (1 + np.exp(-folds_lv[0] / T)), "max_acc")
    assert 0 <= thr <= 1 and at["acc"] > 0.7

    res = run_threshold_sweep(
        folds_lv, folds_y, folds_lt, y_test, objective="max_acc",
        outdir=tmp_path, make_plots=True,
    )
    assert res["aggregate"]["test_auc"]["mean"] > 0.8
    assert (tmp_path / "threshold_sweep.csv").exists()
    assert (tmp_path / "threshold_sweep.json").exists()
    assert (tmp_path / "plots/roc_fold0.png").exists()
    assert (tmp_path / "plots/metrics_fold0.png").exists()
