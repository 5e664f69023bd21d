"""Progressive multi-seed trainer + MM finalize-from-checkpoints flow."""

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.config import MMJointConfig, ProgressiveConfig, ProgressiveStage
from mmtrs_tpu.train.progressive import progressive_ensemble_probs, train_progressive
from mmtrs_tpu.train.vision import VisionData
from tests.synth import synth_images, synth_standardized


def test_progressive_stages_and_ensemble():
    n = 60
    rng = np.random.default_rng(8)
    y = (rng.random(n) < 0.5).astype(int)
    imgs = synth_images(n, 32, seed=9, labels=y)
    mk = lambda s: VisionData(images=imgs[s], y=y[s], origin_id=np.arange(len(y[s])))
    train, val = mk(slice(0, 44)), mk(slice(44, 60))

    cfg = ProgressiveConfig(
        model_name="test_cnn",
        stages=(ProgressiveStage(24, 2, 16, 1e-3), ProgressiveStage(32, 2, 16, 5e-4)),
        seeds=(0, 1),
        warmup_steps=2,
    )
    states = train_progressive(cfg, train, val, log=lambda *a: None)
    assert len(states) == 2  # one per seed
    p = progressive_ensemble_probs(states, val)
    assert p.shape == (16,)
    assert np.isfinite(p).all() and ((p >= 0) & (p <= 1)).all()


def test_mm_finalize_from_ckpts(tmp_path):
    """finalize regenerates OOF/test from saved fold ckpts without retraining
    and matches the training run's predictions."""
    from mmtrs_tpu.train.mm import finalize_mm_from_ckpts, run_mm_kfold

    n = 40
    df = synth_standardized(n, seed=10)
    df["split"] = ["test" if i >= 32 else "train" for i in range(n)]
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 32, seed=11, labels=y)
    cfg = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=8,
                        lr=1e-3, n_folds=2, epochs=2)
    trained = run_mm_kfold(imgs, df, cfg, outdir=tmp_path, epochs=2,
                           save_ckpts=True, log=lambda *a: None)
    final = finalize_mm_from_ckpts(imgs, df, tmp_path, cfg,
                                   outdir=tmp_path, log=lambda *a: None)
    assert (tmp_path / "finalized" / "oof_val.csv").exists()
    assert (tmp_path / "finalized" / "pred_test.csv").exists()
    # same folds + same ckpts → identical predictions
    np.testing.assert_allclose(
        final["oof"]["prob"].to_numpy(), trained["oof"]["prob"].to_numpy(),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        final["test"]["prob"].to_numpy(), trained["test"]["prob"].to_numpy(),
        atol=1e-4,
    )
