"""Device-resident data path (train/common.py device_put_dataset).

Trainers move the whole uint8 dataset into device memory once per run and
index it per step (a device gather) instead of host fancy-indexing +
per-step transfers — measured at ~1.7 s/step through the tunneled-TPU
PCIe hop before the fix (NOTES_ROUND2.md, fourth session). These tests pin
the invariants: callers may pass numpy OR an already-device jax.Array and
get identical results, and the helper never copies a device array.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mmtrs_tpu.train.common import device_put_dataset
from mmtrs_tpu.utils.rng import keys_for_batch
from tests.synth import synth_images, synth_standardized


def test_device_put_dataset_roundtrip_and_noop():
    x = synth_images(4, 16, seed=3)
    d = device_put_dataset(x)
    assert isinstance(d, jax.Array) and d.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(d), x)
    assert device_put_dataset(d) is d  # no copy for device arrays


def test_trainers_accept_device_resident_images(tmp_path):
    """run_mm_kfold / run_mil_kfold give identical artifacts for numpy and
    pre-device-put image inputs (the gather path vs the conversion path)."""
    from mmtrs_tpu.config import MILConfig, MMJointConfig
    from mmtrs_tpu.train.mil import run_mil_kfold
    from mmtrs_tpu.train.mm import run_mm_kfold

    n = 24
    df = synth_standardized(n, seed=9)
    y = df["y_majority"].astype(int).to_numpy()
    imgs = synth_images(n, 16, seed=10, labels=y)
    df["origin_id"] = np.arange(n)
    df["split"] = ["test" if i % 6 == 0 else "train" for i in range(n)]
    if "image_name" not in df.columns:
        df["image_name"] = [f"case_{i}.jpg" for i in range(n)]

    mm_cfg = MMJointConfig(model_name="test_cnn", img_size=16, batch_size=8,
                           lr=1e-3, n_folds=2, epochs=1, train_aug="none")
    a = run_mm_kfold(imgs, df, mm_cfg, outdir=None, epochs=1, log=lambda *x: None)
    b = run_mm_kfold(jnp.asarray(imgs), df, mm_cfg, outdir=None, epochs=1,
                     log=lambda *x: None)
    np.testing.assert_allclose(a["oof"]["prob"], b["oof"]["prob"], atol=1e-5)

    mil_cfg = MILConfig(model_name="test_cnn", bag_size=2, img_size=16,
                        attn_dim=8, epochs=1, batch_size=8, lr=1e-3, n_folds=2)
    am = run_mil_kfold(imgs, df, mil_cfg, outdir=None, epochs=1, log=lambda *x: None)
    bm = run_mil_kfold(jnp.asarray(imgs), df, mil_cfg, outdir=None, epochs=1,
                       log=lambda *x: None)
    np.testing.assert_allclose(am["oof"]["prob"], bm["oof"]["prob"], atol=1e-5)


def test_records_builder_device_path_matches_uint8_contract():
    """build_augmented_table returns uint8 children regardless of input
    dtype (the on-device quantization contract)."""
    from mmtrs_tpu.data.records import build_augmented_table

    n = 6
    df = synth_standardized(n, seed=4)
    imgs = synth_images(n, 16, seed=5)
    table, out = build_augmented_table(df, imgs, n_aug=1, preset="simple",
                                       seed=7, test_frac=0.34)
    assert out.dtype == np.uint8 and len(out) == 2 * n
    np.testing.assert_array_equal(out[:n], imgs)  # originals pass through
