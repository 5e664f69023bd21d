"""End-to-end serving integration: train tiny fold models → save ckpts →
build the service from the weights folder → predict a case (the full UI
backend path: preprocess → MM/MIL/Tab streams → stacker → label)."""

import numpy as np
import pandas as pd
import pytest

from mmtrs_tpu.config import MILConfig, MMJointConfig, GBDTConfig
from mmtrs_tpu.serve.choices import CHOICES_MAP, FIELD_ORDER
from tests.synth import synth_images, synth_standardized


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """Train minimal MM + MIL fold models and a tab ensemble; save with
    recipes in the reference weights layout."""
    root = tmp_path_factory.mktemp("weights")
    n = 60
    df = synth_standardized(n, seed=41)
    df["split"] = ["test" if i >= 48 else "train" for i in range(n)]
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 32, seed=42, labels=y)

    from mmtrs_tpu.train.mm import run_mm_kfold

    mm_cfg = MMJointConfig(model_name="test_cnn", img_size=32, batch_size=12,
                           lr=1e-3, n_folds=2, epochs=2)
    run_mm_kfold(imgs, df, mm_cfg, outdir=root / "mm_dualtask_v1",
                 epochs=2, save_ckpts=True, log=lambda *a: None)

    from mmtrs_tpu.train.mil import run_mil_kfold

    mil_cfg = MILConfig(model_name="test_cnn", bag_size=2, img_size=32,
                        attn_dim=8, epochs=2, batch_size=12, lr=1e-3, n_folds=2)
    run_mil_kfold(imgs, df, mil_cfg, outdir=root / "mil_v1",
                  epochs=2, save_ckpts=True, log=lambda *a: None)

    from mmtrs_tpu.train.tabular import train_tab_kfold

    train_tab_kfold(
        df, outdir=root / "tab_v1", n_folds=2,
        cfg=GBDTConfig(**{**GBDTConfig.stack_tab_like().__dict__, "n_estimators": 80}),
    )
    return root


def test_build_service_and_predict(weights_dir):
    from mmtrs_tpu.serve.ensembles import build_service_from_weights

    svc = build_service_from_weights(weights_dir)
    assert svc.mm_predict is not None
    assert svc.mil_predict is not None
    assert svc.tab_predict is not None
    assert svc.stacker is not None

    img = synth_images(1, 520, seed=77)[0]
    # image-only path
    out = svc.predict_one(img)
    assert out["label"] in ("Direct", "Indirect")
    assert set(out["streams"]) == {"prob_mm", "prob_mil"}
    assert 0 <= out["p_indirect"] <= 1
    # full multimodal path
    fields = {k: list(CHOICES_MAP[k])[0] for k in FIELD_ORDER}
    out2 = svc.predict_one(img, fields, thr_mode="max_acc")
    assert set(out2["streams"]) == {"prob_mm", "prob_mil", "prob_tab"}
    assert out2["used_tabular"]
    assert out2["processed_image"].shape == (512, 512, 3)


def test_ensembles_individually(weights_dir):
    from mmtrs_tpu.serve.ensembles import MILEnsemble, MMEnsemble, TabEnsemble

    mm = MMEnsemble.from_folder(weights_dir / "mm_dualtask_v1")
    assert mm is not None and len(mm.folds) == 2
    img = synth_images(1, 32, seed=5)[0].astype(np.float32)
    p_with = mm.predict(img, [1, 0, 1, 1, 0, 0, 1, 1, 0])
    p_without = mm.predict(img, None)  # scaler-mean fallback (infer_mm:75-83)
    assert 0 <= p_with <= 1 and 0 <= p_without <= 1

    mil = MILEnsemble.from_folder(weights_dir / "mil_v1", )
    assert mil is not None
    mil.crop_size = 24  # small images in this test
    case_imgs = synth_images(3, 32, seed=6).astype(np.float32)
    p_case = mil.predict(case_imgs)  # bag over all images of a case
    assert 0 <= p_case <= 1

    tab = TabEnsemble.from_folder(weights_dir / "tab_v1")
    assert tab is not None and len(tab.forests) == 2
    assert 0 <= tab.predict_one([1, 0, 1, 1, 0, 0, 1, 1, 0]) <= 1


def test_missing_weights_graceful(tmp_path):
    from mmtrs_tpu.serve.ensembles import build_service_from_weights

    svc = build_service_from_weights(tmp_path)  # empty folder
    img = synth_images(1, 520, seed=9)[0]
    out = svc.predict_one(img)
    assert "error" in out  # no streams → explicit error, no crash
