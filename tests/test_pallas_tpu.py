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
