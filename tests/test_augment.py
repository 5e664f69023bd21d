"""Augmentation suite: determinism, preset semantics, distributional checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmtrs_tpu.ops.augment import (
    augment_batch,
    augment_legacy,
    augment_simple,
    augment_ten,
    brightness_contrast,
    coarse_dropout,
    elastic,
    gauss_noise,
    gaussian_blur3,
    hsv_shift,
    motion_blur,
)
from mmtrs_tpu.utils.rng import keys_for_batch
from tests.synth import synth_images


@pytest.fixture(scope="module")
def batch():
    imgs = synth_images(6, 64, seed=5).astype(np.float32)
    keys = keys_for_batch(42, np.arange(6), np.arange(6))
    return jnp.asarray(imgs), keys


def test_brightness_contrast_semantics():
    img = jnp.full((1, 4, 4, 3), 100.0)
    out = brightness_contrast(img, jnp.array([0.1]), jnp.array([0.2]))
    assert float(out[0, 0, 0, 0]) == pytest.approx(100 * 1.2 + 25.5, abs=1e-3)


def test_hsv_shift_roundtrip_zero():
    imgs = jnp.asarray(synth_images(2, 16, seed=6).astype(np.float32))
    z = jnp.zeros(2)
    out = hsv_shift(imgs, z, z, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1.0)


def test_gauss_noise_variance(batch):
    imgs, keys = batch
    flat = jnp.full((6, 64, 64, 3), 128.0)
    out = gauss_noise(flat, keys, jnp.full(6, 100.0))
    resid = np.asarray(out) - 128.0
    assert abs(resid.std() - 10.0) < 1.0


def test_blurs_preserve_mean(batch):
    imgs, keys = batch
    g = gaussian_blur3(imgs)
    m = motion_blur(imgs, keys, 5)
    assert abs(float(g.mean()) - float(imgs.mean())) < 1.0
    assert abs(float(m.mean()) - float(imgs.mean())) < 1.0
    # blurring reduces high-frequency energy
    hf = lambda x: float(jnp.abs(jnp.diff(x, axis=2)).mean())
    assert hf(g) < hf(imgs)
    assert hf(m) < hf(imgs)


def test_elastic_displaces_but_preserves_stats(batch):
    imgs, keys = batch
    out = elastic(imgs, keys, alpha=10.0, sigma=5.0)
    assert not np.allclose(np.asarray(out), np.asarray(imgs))
    assert abs(float(out.mean()) - float(imgs.mean())) < 5.0


def test_coarse_dropout_zeroes_one_hole(batch):
    imgs, keys = batch
    bright = jnp.full((6, 64, 64, 3), 200.0)
    out = np.asarray(coarse_dropout(bright, keys, hole=8))
    for b in range(6):
        n_zero = int((out[b] == 0).all(axis=-1).sum())
        assert n_zero == 64  # exactly an 8×8 hole


def test_augment_ten_variant_dispatch(batch):
    imgs, keys = batch
    # variant 0 = hflip exactly
    out = np.asarray(augment_ten(imgs, keys, jnp.zeros(6, jnp.int32)))
    want = np.asarray(imgs)[:, :, ::-1, :]
    np.testing.assert_allclose(out, want, atol=1e-2)
    # variant 1 = vflip
    out = np.asarray(augment_ten(imgs, keys, jnp.ones(6, jnp.int32)))
    np.testing.assert_allclose(out, np.asarray(imgs)[:, ::-1, :, :], atol=1e-2)
    # all ten variants differ from the original
    for k in range(2, 10):
        out = np.asarray(augment_ten(imgs, keys, jnp.full(6, k, jnp.int32)))
        assert not np.allclose(out, np.asarray(imgs), atol=0.5), k


def test_augment_deterministic_per_key(batch):
    imgs, keys = batch
    a = np.asarray(augment_ten(imgs, keys, jnp.full(6, 4, jnp.int32)))
    b = np.asarray(augment_ten(imgs, keys, jnp.full(6, 4, jnp.int32)))
    np.testing.assert_array_equal(a, b)
    keys2 = keys_for_batch(43, np.arange(6), np.arange(6))
    c = np.asarray(augment_ten(imgs, keys2, jnp.full(6, 4, jnp.int32)))
    assert not np.allclose(a, c)


def test_augment_legacy_runs_and_stays_in_range(batch):
    imgs, keys = batch
    out = np.asarray(augment_legacy(imgs, keys, img_size=64))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    # hflip p=.5 ⇒ outputs differ across samples/keys
    assert not np.allclose(out, np.asarray(imgs))


def test_augment_simple_runs(batch):
    imgs, keys = batch
    for k in (0, 3, 5, 7, 8, 9):
        out = np.asarray(augment_simple(imgs, keys, jnp.full(6, k, jnp.int32)))
        assert out.shape == imgs.shape
        assert out.min() >= 0.0 and out.max() <= 255.0


def test_augment_batch_dispatch(batch):
    imgs, keys = batch
    assert augment_batch(imgs, keys, "none") is imgs
    out = augment_batch(imgs, keys, "ten", aug_idx=np.zeros(6, np.int32))
    assert out.shape == imgs.shape
    with pytest.raises(ValueError):
        augment_batch(imgs, keys, "bogus")


def test_subset_apply_matches_full_masked_apply(batch):
    """subset_apply (static-cap batch compaction) must reproduce the plain
    compute-everything + jnp.where SPMD masking it replaces, for every mask
    population up to and beyond the cap (overflow → fallback): untouched
    rows bit-exact, selected rows equal up to fp-contraction ULPs (XLA
    schedules the [cap,...] and [B,...] programs differently)."""
    from mmtrs_tpu.ops.augment import subset_apply

    imgs, keys = batch
    op = lambda s, k: gauss_noise(s, k, jnp.full(s.shape[0], 9.0))
    masks = [jnp.arange(6) < n for n in (0, 1, 3, 5, 6)]
    masks.append(jnp.asarray([True, False, False, True, False, True]))
    for on in masks:  # cap=3 exercises both the subset and fallback paths
        want = np.where(np.asarray(on)[:, None, None, None], op(imgs, keys), imgs)
        got = np.asarray(subset_apply(op, imgs, on, 3, keys))
        off = ~np.asarray(on)
        np.testing.assert_array_equal(got[off], np.asarray(imgs)[off])
        np.testing.assert_allclose(got, want, atol=1e-3)  # 0..255 scale


def test_subset_cap_is_sane():
    from mmtrs_tpu.ops.augment import _subset_cap

    assert _subset_cap(32, 0.1) < 16  # pays ≤ half the batch at p=.1
    assert _subset_cap(2, 0.1) == 2  # tiny batches degrade to full apply
    assert _subset_cap(32, 1.0) == 32


def test_randaug_apply_gate_and_posterize_map():
    """timm parity pins for the round-4 advisor fixes: each drawn op applies
    with prob 0.5 (AugmentOp(prob=0.5)), and PosterizeIncreasing keeps
    4-int(4m) bits — step 16 at m=0 up to 128 (≥1 bit kept) at m→1."""
    import jax
    import jax.numpy as jnp

    from mmtrs_tpu.ops.augment import _randaug_params

    n = 400
    keys = jax.vmap(jax.random.key)(jnp.arange(n))
    geo, phot = jax.vmap(
        lambda k: _randaug_params(k, 64, 64, magnitude=9.0, mag_std=0.5,
                                  n_ops=2)
    )(keys)
    ident = jnp.eye(3)
    changed_geo = (jnp.abs(geo - ident).max(axis=(1, 2)) > 1e-6)
    changed_phot = (
        phot["invert"] | phot["autoc"]
        | (phot["post_step"] > 1.0) | (phot["solar_thr"] < 256.0)
        | (phot["solar_add"] > 0.0) | (phot["color_f"] != 1.0)
        | (phot["contrast_f"] != 1.0) | (phot["bright_f"] != 1.0)
        | (phot["sharp_f"] != 1.0)
    )
    any_applied = np.asarray(changed_geo | changed_phot)
    # P(no op applies) = (1 - 14/14·0.5)^2 = 0.25 → applied rate ≈ 0.75.
    # Without the 0.5 gate the rate would be 1.0 (every draw applies).
    rate = any_applied.mean()
    assert 0.64 <= rate <= 0.86, rate

    # posterize steps: powers of two in [16, 128] when drawn (m≈9 → mostly
    # 128); never exceeds 128 (≥1 bit kept), never below 16 (timm m=0 floor)
    steps = np.asarray(phot["post_step"])
    drawn = steps > 1.0
    assert drawn.any()
    vals = np.unique(steps[drawn])
    assert vals.min() >= 16.0 and vals.max() <= 128.0, vals
    assert all(float(v) in {16.0, 32.0, 64.0, 128.0} for v in vals), vals
