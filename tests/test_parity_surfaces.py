"""Direct tests for the parity surfaces flagged untested in round 3:

- fusion/streams.collect_base_preds — model discovery + the reference's
  graceful-None contract (prepare_streams.py:134-176): any stream that
  cannot load or predict yields None, never an exception;
- train/mm.finalize_mm_from_ckpts — regenerated OOF/test artifacts must
  match the training run's (finalize_mm_dualtask_from_ckpts.py:122-184);
- scripts/eval_vision.py --tune_on val — threshold re-tuned on the val
  split instead of the recipe's stored value;
- GBDT quality regression (slow) — the JAX forest must stay at-or-above
  sklearn HistGradientBoosting on the pinned audit cohort.
"""

import json

import numpy as np
import pandas as pd
import pytest

from tests.synth import synth_images, synth_standardized


# ---------------------------------------------------------------------------
# collect_base_preds
# ---------------------------------------------------------------------------


def _tiny_frames(n=40, seed=7):
    df = synth_standardized(n, seed=seed)
    is_test = df["split"] == "test"
    return (
        df[~is_test].reset_index(drop=True),
        df[is_test].reset_index(drop=True),
    )


def test_collect_base_preds_empty_dirs_all_none(tmp_path):
    from mmtrs_tpu.fusion.streams import collect_base_preds

    df_val, df_test = _tiny_frames()
    out = collect_base_preds(
        df_val, df_test, images_val=None, images_test=None,
        weight_dir=tmp_path / "weights", ml_dir=tmp_path / "ml",
    )
    for split in ("val", "test"):
        assert set(out[split]) == {"v_hard", "v_soft", "xgb", "lgbm"}
        assert all(v is None for v in out[split].values())


def test_collect_base_preds_discovers_saved_models(tmp_path):
    import jax.numpy as jnp

    from mmtrs_tpu.config import GBDTConfig, VisionTrainConfig
    from mmtrs_tpu.data.features import build_features
    from mmtrs_tpu.fusion.streams import collect_base_preds
    from mmtrs_tpu.models.gbdt import train_gbdt
    from mmtrs_tpu.train.vision import VisionTrainer
    from mmtrs_tpu.utils.checkpoint import save_checkpoint

    df_val, df_test = _tiny_frames()
    imgs_val = synth_images(len(df_val), 32, seed=1)
    imgs_test = synth_images(len(df_test), 32, seed=2)

    # a real (tiny) forest, discovered via the xgb_forest.npz glob
    X = build_features(df_val).to_numpy(np.float32)
    y = df_val["y_majority"].astype(int).to_numpy()
    cfg = GBDTConfig(n_estimators=8, max_depth=2, early_stopping_rounds=0)
    ml_dir = tmp_path / "ml" / "sub"
    train_gbdt(X, y, cfg).save(ml_dir / "xgb_forest")

    # a real (untrained) vision checkpoint + recipe sidecar, nested one level
    wdir = tmp_path / "weights" / "vision"
    vt = VisionTrainer(
        VisionTrainConfig(model_name="test_cnn", img_size=32, task="hard",
                          bf16=False)
    )
    state = vt.init_state(total_steps=1)
    save_checkpoint(
        wdir / "vision_hard_best",
        {"params": state.params, "batch_stats": state.batch_stats},
        recipe={"model_name": "test_cnn", "img_size": 32, "task": "hard"},
    )

    out = collect_base_preds(
        df_val, df_test, imgs_val, imgs_test,
        weight_dir=tmp_path / "weights", ml_dir=tmp_path / "ml",
    )
    assert out["val"]["v_soft"] is None and out["test"]["lgbm"] is None
    for split, n in (("val", len(df_val)), ("test", len(df_test))):
        for k in ("v_hard", "xgb"):
            p = out[split][k]
            assert p is not None and len(p) == n
            assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()


def test_collect_base_preds_failure_modes_yield_none(tmp_path):
    from mmtrs_tpu.fusion.streams import collect_base_preds

    df_val, df_test = _tiny_frames()
    imgs = synth_images(len(df_val), 32, seed=1)
    imgs_te = synth_images(len(df_test), 32, seed=2)

    wdir = tmp_path / "weights"
    mldir = tmp_path / "ml"
    wdir.mkdir()
    mldir.mkdir()
    # recipe sidecar present but checkpoint payload missing entirely
    (wdir / "vision_hard_best.recipe.json").write_text(
        json.dumps({"model_name": "test_cnn", "img_size": 32, "task": "hard"})
    )
    # recipe naming a model the factory doesn't know
    (wdir / "vision_soft_best.recipe.json").write_text(
        json.dumps({"model_name": "no_such_arch", "img_size": 32,
                    "task": "soft"})
    )
    # corrupt forest files
    (mldir / "xgb_forest.npz").write_bytes(b"not a real npz")
    (mldir / "lgbm_forest.npz").write_bytes(b"")
    (mldir / "lgbm_forest.json").write_text("{broken")

    out = collect_base_preds(df_val, df_test, imgs, imgs_te,
                             weight_dir=wdir, ml_dir=mldir)
    for split in ("val", "test"):
        assert all(out[split][k] is None
                   for k in ("v_hard", "v_soft", "xgb", "lgbm"))


# ---------------------------------------------------------------------------
# finalize_mm_from_ckpts
# ---------------------------------------------------------------------------


def test_finalize_mm_from_ckpts_matches_training_run(tmp_path):
    from mmtrs_tpu.config import MMJointConfig
    from mmtrs_tpu.train.mm import finalize_mm_from_ckpts, run_mm_kfold

    n = 60
    df = synth_standardized(n, seed=11)
    df["split"] = ["test" if i >= 48 else "train" for i in range(n)]
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 32, seed=12, labels=y)
    cfg = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=12,
                        lr=1e-3, n_folds=2, epochs=2, train_aug="none")
    train_dir = tmp_path / "train"
    out = run_mm_kfold(imgs, df, cfg, outdir=train_dir, epochs=2,
                       save_ckpts=True, log=lambda *a: None)

    fin = finalize_mm_from_ckpts(imgs, df, ckpt_dir=train_dir, cfg=cfg,
                                 outdir=tmp_path / "fin", log=lambda *a: None)

    # regenerated artifacts must reproduce the training run's
    oof_train = pd.read_csv(train_dir / "oof_val.csv")
    oof_fin = pd.read_csv(tmp_path / "fin" / "finalized" / "oof_val.csv")
    te_train = pd.read_csv(train_dir / "pred_test.csv")
    te_fin = pd.read_csv(tmp_path / "fin" / "finalized" / "pred_test.csv")
    assert list(oof_fin["image_name"]) == list(oof_train["image_name"])
    assert list(te_fin["image_name"]) == list(te_train["image_name"])
    np.testing.assert_allclose(oof_fin["prob"], oof_train["prob"], atol=1e-5)
    np.testing.assert_allclose(te_fin["prob"], te_train["prob"], atol=1e-5)
    from mmtrs_tpu.metrics import roc_auc

    assert fin["summary"]["oof_auc"] == pytest.approx(
        roc_auc(oof_train["y"].to_numpy(), oof_train["prob"].to_numpy()),
        abs=1e-6,
    )
    assert out["summary"]["test_auc"] is not None


# ---------------------------------------------------------------------------
# eval_vision --tune_on val
# ---------------------------------------------------------------------------


def test_eval_vision_tune_on_val(tmp_path, capsys):
    from PIL import Image

    from mmtrs_tpu.config import VisionTrainConfig
    from mmtrs_tpu.train.vision import VisionData, VisionTrainer
    from mmtrs_tpu.utils.checkpoint import save_checkpoint
    from scripts.eval_vision import main as eval_main

    n = 48
    rng = np.random.default_rng(0)
    y = (rng.random(n) < 0.5).astype(int)
    imgs = synth_images(n, 32, seed=3, labels=y)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = [f"case_{i}.png" for i in range(n)]
    for nm, im in zip(names, imgs):
        Image.fromarray(im).save(img_dir / nm)
    split = ["train"] * 24 + ["val"] * 12 + ["test"] * 12
    pd.DataFrame({"image_name": names, "y_majority": y, "split": split}).to_csv(
        tmp_path / "data.csv", index=False
    )

    cfg = VisionTrainConfig(model_name="test_cnn", img_size=32, task="hard",
                            epochs=2, batch_size=12, bf16=False, seed=0)
    t = VisionTrainer(cfg)
    tr = VisionData(images=imgs[:24], y=y[:24])
    va = VisionData(images=imgs[24:36], y=y[24:36])
    state, _ = t.fit(tr, va)
    save_checkpoint(
        tmp_path / "ck" / "vision_hard_best",
        {"params": state.params, "batch_stats": state.batch_stats},
        # sentinel threshold the tuner could never return (grid ⊂ (0,1))
        recipe={"model_name": "test_cnn", "img_size": 32, "task": "hard",
                "thr": 0.999},
    )

    rc = eval_main([
        "--ckpt", str(tmp_path / "ck" / "vision_hard_best"),
        "--data", str(tmp_path / "data.csv"),
        "--image_dir", str(img_dir),
        "--split", "test", "--tune_on", "val",
        "--outdir", str(tmp_path / "out"),
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    thr = float(printed.rsplit("thr=", 1)[1].split()[0])
    assert thr != pytest.approx(0.999)  # recipe thr overridden by val tuning
    assert 0.0 < thr < 0.99
    assert (tmp_path / "out" / "metrics_vision_hard.json").exists()
    preds = pd.read_csv(
        tmp_path / "out" / "vision_hard_test_predictions.csv"
    )
    assert len(preds) == 12 and preds["prob"].between(0, 1).all()


# ---------------------------------------------------------------------------
# GBDT quality regression (slow)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_gbdt_quality_at_or_above_sklearn_hgb():
    """Pin the audit cohort as a regression bar: the JAX histogram forest
    must not fall more than 0.01 AUC below sklearn HistGradientBoosting on
    any of the three streams (classifier / soft regressor / stack)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from gbdt_audit import run_audit

    rep = run_audit()
    worst = min(rep["delta"].values())
    assert worst >= -0.01, rep["delta"]
    assert rep["verdict"] in ("above_baseline", "at_or_above_baseline")
