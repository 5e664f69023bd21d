"""End-to-end trainer tests on tiny synthetic data (CPU, 8 virtual devices).

These verify the full train loops LEARN (AUC above chance on a held-out set
with a visual cue), plus checkpoint recipes and the progressive/ensemble
machinery — miniaturized (32px, efficientnet_b0, few epochs).
"""

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.config import MILConfig, MMJointConfig, VisionTrainConfig
from mmtrs_tpu.metrics import roc_auc
from mmtrs_tpu.train.vision import VisionData, VisionTrainer, ensemble_predict
from tests.synth import synth_images, synth_standardized


@pytest.fixture(scope="module")
def vision_dataset():
    n = 120
    rng = np.random.default_rng(0)
    y = (rng.random(n) < 0.5).astype(int)
    imgs = synth_images(n, 32, seed=1, labels=y)
    tr = slice(0, 80)
    va = slice(80, 100)
    te = slice(100, 120)
    mk = lambda s: VisionData(images=imgs[s], y=y[s],
                              p=y[s].astype(np.float32),
                              w=np.ones(len(y[s]), np.float32),
                              origin_id=np.arange(len(y[s])))
    return mk(tr), mk(va), mk(te)


def _small_cfg(task="hard", epochs=4):
    return VisionTrainConfig(
        model_name="test_cnn", img_size=32, task=task, epochs=epochs,
        batch_size=16, lr=1e-3, drop_rate=0.0, drop_path=0.0, bf16=False, seed=0,
    )


def test_hard_trainer_learns(vision_dataset):
    train, val, test = vision_dataset
    t = VisionTrainer(_small_cfg("hard"))
    state, history = t.fit(train, val)
    assert len(history) == 4
    assert history[0]["imgs_per_sec"] > 0
    p = t.predict_proba(state, test, tta=True)
    auc = roc_auc(test.y, p)
    assert auc > 0.8, auc
    thr = t.tune_threshold_f1(state, val)
    assert 0.05 <= thr <= 0.95


def test_soft_trainer_learns(vision_dataset):
    train, val, test = vision_dataset
    t = VisionTrainer(_small_cfg("soft"))
    state, _ = t.fit(train, val)
    p = t.predict_proba(state, test)
    assert roc_auc(test.y, p) > 0.75


def test_ensemble_predict_nan_safe(vision_dataset):
    from mmtrs_tpu.train.vision import per_model_aucs

    train, val, test = vision_dataset
    t = VisionTrainer(_small_cfg("hard", epochs=2))
    s1, _ = t.fit(train, val)
    p = ensemble_predict(t, [s1, s1], test)
    assert np.isfinite(p).all()
    assert ((p >= 0) & (p <= 1)).all()
    # per-member diagnostics (ensemble_hard.py:122-137 parity)
    aucs = per_model_aucs(t, [s1, s1], test)
    assert len(aucs) == 2 and aucs[0] == aucs[1]


def test_mil_trainer_learns():
    from mmtrs_tpu.train.mil import run_mil_kfold

    n = 90
    rng = np.random.default_rng(2)
    y = (rng.random(n) < 0.5).astype(int)
    imgs = synth_images(n, 48, seed=3, labels=y)
    df = pd.DataFrame(
        {
            "image_name": [f"{i}.jpg" for i in range(n)],
            "y_majority": y,
            "origin_id": np.arange(n),
            "split": ["test" if i >= 70 else "train" for i in range(n)],
        }
    )
    cfg = MILConfig(model_name="test_cnn", bag_size=3, img_size=32,
                    attn_dim=16, epochs=3, batch_size=12, lr=1e-3, n_folds=2)
    out = run_mil_kfold(imgs, df, cfg, epochs=3, log=lambda *a: None)
    assert out["summary"]["test_auc"] > 0.65
    assert set(out["oof"].columns) == {"image_name", "y", "prob"}
    assert len(out["test"]) == 20


def test_mm_trainer_learns(tmp_path):
    from mmtrs_tpu.train.mm import run_mm_kfold

    n = 90
    df = synth_standardized(n, seed=4)
    df["split"] = ["test" if i >= 70 else "train" for i in range(n)]
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 32, seed=5, labels=y)
    cfg = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=12,
                        lr=1e-3, n_folds=2, epochs=5, train_aug="none")
    out = run_mm_kfold(imgs, df, cfg, outdir=tmp_path, epochs=5, log=lambda *a: None)
    # smoke-level learning bar: tiny model, 2 folds of ~25 rows, 5 epochs —
    # asserts above-chance learning + artifact contract, not model quality
    assert out["summary"]["test_auc"] > 0.58
    assert (tmp_path / "oof_val.csv").exists()
    assert (tmp_path / "pred_test.csv").exists()
    assert (tmp_path / "summary.json").exists()
    oof = pd.read_csv(tmp_path / "oof_val.csv")
    assert list(oof.columns) == ["image_name", "y", "prob"]
    assert oof["prob"].notna().all()


def test_mm_train_aug_changes_train_batches_not_eval():
    """cfg.train_aug ("randaug", the reference's timm create_transform
    parity — train_mm_joint_dualtask.py:72-93) must alter TRAIN batch prep,
    deterministically per (seed, row, epoch), while eval prep is untouched."""
    import jax.numpy as jnp

    from mmtrs_tpu.config import MMJointConfig
    from mmtrs_tpu.train.mm import MMTrainer

    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)
    sel = np.arange(8)

    cfg_aug = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=8,
                            train_aug="randaug")
    cfg_off = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=8,
                            train_aug="none")
    tr_aug = MMTrainer(cfg_aug)
    tr_off = MMTrainer(cfg_off)

    a0 = np.asarray(tr_aug._prep_train(imgs, sel, epoch=0))
    a0b = np.asarray(tr_aug._prep_train(imgs, sel, epoch=0))
    a1 = np.asarray(tr_aug._prep_train(imgs, sel, epoch=1))
    off = np.asarray(tr_off._prep_train(imgs, sel, epoch=0))
    ev_aug = np.asarray(tr_aug._prep(imgs))
    ev_off = np.asarray(tr_off._prep(imgs))

    assert np.array_equal(a0, a0b)            # deterministic per (row, epoch)
    assert np.abs(a0 - a1).max() > 1e-3       # epochs see different draws
    assert np.abs(a0 - off).max() > 1e-3      # augmentation actually applied
    assert np.array_equal(ev_aug, ev_off)     # eval prep ignores train_aug
    assert np.array_equal(off, ev_off)        # "none" train prep == eval prep
    assert np.isfinite(a0).all()
