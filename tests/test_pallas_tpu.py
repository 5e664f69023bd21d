"""TPU-only Pallas kernel regression tests.

The hermetic CI suite runs on CPU (conftest forces JAX_PLATFORMS=cpu), where
Mosaic kernels cannot compile — these tests auto-skip there and run when the
suite executes on a real TPU. They pin the bit-exactness contract between
the Pallas CLAHE and its XLA oracle (validated manually on v5e during
development; see NOTES_ROUND1.md).
"""

import numpy as np
import pytest

import jax


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="requires a TPU device")


@pytest.mark.parametrize("shape,tiles", [((2, 64, 64), (8, 8)),
                                         ((2, 128, 128), (4, 4)),
                                         ((3, 512, 512), (8, 8))])
def test_clahe_pallas_bit_exact_vs_xla(shape, tiles):
    import jax.numpy as jnp

    from mmtrs_tpu.ops.clahe import clahe
    from mmtrs_tpu.ops.pallas.clahe_kernel import clahe_pallas

    rng = np.random.default_rng(0)
    l = (rng.random(shape) * 255).astype(np.float32)
    a = np.asarray(clahe(jnp.asarray(l), tiles=tiles))
    b = np.asarray(clahe_pallas(jnp.asarray(l), tiles=tiles))
    np.testing.assert_array_equal(a, b)


def test_shift_rows_pallas_matches_xla():
    import jax.numpy as jnp

    from mmtrs_tpu.ops.pallas.shift_kernel import shift_rows_pallas
    from mmtrs_tpu.ops import warp

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (2, 64, 128, 3)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-30, 30, (2, 64)).astype(np.float32))
    want = np.asarray(warp._shift_rows_frac_xla(img, off))

    B, H, W, C = img.shape
    planar = img.transpose(0, 3, 1, 2).reshape(B * C * H, W)
    off_r = jnp.broadcast_to(off[:, None, :], (B, C, H)).reshape(-1)
    got = np.asarray(shift_rows_pallas(planar, off_r))
    got = got.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_shift_rows_windowed_pallas_matches_xla():
    import jax.numpy as jnp

    from mmtrs_tpu.ops import warp
    from mmtrs_tpu.ops.pallas.shift_kernel import shift_rows_windowed_pallas

    rng = np.random.default_rng(3)
    B, H, W, C = 2, 32, 128, 3
    img = jnp.asarray(rng.uniform(0, 255, (B, H, W, C)).astype(np.float32))
    off = jnp.asarray(rng.uniform(-4, 4, (B, H, W)).astype(np.float32))
    # XLA reference path (bypass the TPU dispatch by calling the slice code)
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    src = jnp.clip(xx + off, 0.0, W - 1.0)
    rel = (src - xx)[..., None]
    pad = jnp.pad(img, ((0, 0), (0, 0), (5, 6), (0, 0)), mode="edge")
    want = jnp.zeros_like(img)
    for k in range(-5, 7):
        w = jnp.maximum(1.0 - jnp.abs(rel - k), 0.0)
        want = want + w * jax.lax.slice_in_dim(pad, 5 + k, 5 + k + W, axis=2)
    want = np.asarray(want)

    planar = img.transpose(0, 3, 1, 2).reshape(B * C * H, W)
    off_r = jnp.broadcast_to(off[:, None, :, :], (B, C, H, W)).reshape(-1, W)
    got = np.asarray(shift_rows_windowed_pallas(planar, off_r, 5))
    got = got.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_preprocess_pipeline_on_tpu():
    import jax.numpy as jnp

    from mmtrs_tpu.preprocess import preprocess_batch

    rng = np.random.default_rng(1)
    x = (rng.random((2, 512, 512, 3)) * 255).astype(np.uint8)
    out, info = preprocess_batch(jnp.asarray(x), use_pallas=True)
    out = np.asarray(out)
    assert out.shape == (2, 512, 512, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 255
